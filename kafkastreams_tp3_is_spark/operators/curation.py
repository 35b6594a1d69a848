"""Data-curation operators for assembling LLM training corpora, over
``documents``: deterministic sampling, text normalization, PII scrubbing,
and benchmark decontamination. Complements dedup.py (duplicate removal)
and text.py (quality signals) — together the selection/cleaning stages of
a training-data pipeline.

All hot paths are built-in JVM expressions (no Python workers); every op
is a narrow per-row map except decontamination's broadcast semi-join.
Each op is exactly restatable in ANSI SQL, so all four carry full DuckDB
value-hash oracles — no rows-only gates in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import owned, persisted
from ..views import load, spread

# --- deterministic sampling -------------------------------------------

def sample_deterministic(spark: SparkSession, sf_dir: str,
                         hex_cutoff: str = "1a") -> DataFrame:
    """Reproducible content-addressed sampling: keep a document iff the
    first two hex chars of md5(doc_id) sort below ``hex_cutoff``
    ('1a' -> 26/256 ~ 10.2%). Unlike rng-based ``df.sample`` this is a
    pure function of the key: stable across runs, cluster sizes, and
    engines (the DuckDB oracle states the identical predicate), and a
    document's membership never changes when the corpus grows — the
    property training-data ablations need.

    Scale: a filter on a scalar expression — fully pushed into the scan
    stage, no shuffle, no state."""
    docs = load(spark, sf_dir, "documents")
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (docs.where(key < hex_cutoff)
                .select("doc_id", key.alias("sample_key"), "lang", "source",
                        "n_chars"))


# --- stratified per-source sampling ------------------------------------

def stratified_sample(spark: SparkSession, sf_dir: str,
                      fractions: dict[str, float] | None = None,
                      default_fraction: float = 0.10) -> DataFrame:
    """Per-stratum content-addressed sampling: each source keeps its own
    fraction of documents (e.g. downsample 'web' to 5% while keeping
    'books' at 50%), decided by whether the first 4 hex chars of
    md5(doc_id) fall below floor(fraction * 65536). Membership is a pure
    function of (doc_id, its source's fraction): stable across runs,
    engines, and corpus growth — the per-domain rebalancing knob of a
    data-mixing recipe, complementing mix_by_source (absolute quota,
    needs a rank shuffle) with a rate (no shuffle at all).

    Cutoffs are integer-exact (floor of fraction*65536, compared against
    the hex-decoded 16-bit prefix), so no float threshold can round
    differently across engines.

    Scale: a scalar predicate on md5 — fully pushed into the scan, zero
    shuffle, zero state; skew-immune because no grouping happens."""
    fractions = fractions if fractions is not None else {
        "web": 0.05, "news": 0.20, "books": 0.50}
    docs = load(spark, sf_dir, "documents")
    key16 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                   16, 10).cast("long")
    cutoff = F.lit(int(default_fraction * 65536))
    for src, frac in sorted(fractions.items()):
        cutoff = F.when(F.col("source") == src,
                        F.lit(int(frac * 65536))).otherwise(cutoff)
    return (docs.select("doc_id", "source", "lang", "n_chars",
                        key16.alias("sample_key16"),
                        cutoff.cast("long").alias("stratum_cutoff"))
            .where(F.col("sample_key16") < F.col("stratum_cutoff")))


# --- document chunking --------------------------------------------------

def doc_chunk(spark: SparkSession, sf_dir: str, chunk_chars: int = 600,
              overlap: int = 100) -> DataFrame:
    """Split every document into fixed-size overlapping windows — the
    context-window preprocessing step for training/embedding pipelines.
    Stride is chunk_chars - overlap; every chunk except the last has
    exactly chunk_chars characters, the last covers the tail (length in
    (overlap, chunk_chars] for multi-chunk docs), and a document shorter
    than one chunk yields a single chunk of itself. The chunk count is
    computed with pure integer arithmetic (1 + ceil_div(n - chunk,
    stride)), so both engines agree at every boundary.

    Scale: sequence+posexplode is a narrow per-row generator — no
    shuffle, no state, output rows ∝ input chars / stride. On a real
    cluster the explode stays inside the scan stage's codegen, and
    chunk_text is sliced from the already-loaded text column (no
    re-read amplification)."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    docs = load(spark, sf_dir, "documents")
    n = F.length("text")
    # ceil_div via floor((x + stride - 1) / stride): exact in double for
    # any realistic document length (< 2^52 chars)
    num = F.when(n <= chunk_chars, F.lit(1).cast("long")).otherwise(
        F.lit(1) + F.floor((n - chunk_chars + stride - 1) / stride)
                     .cast("long"))
    start = (F.col("chunk_index") * stride).cast("long")
    return (docs
            .select("doc_id", "text",
                    F.posexplode(F.sequence(F.lit(0).cast("long"),
                                            num - 1))
                     .alias("chunk_index", "_i"))
            .select("doc_id",
                    F.col("chunk_index").cast("bigint").alias("chunk_index"),
                    start.alias("chunk_start"),
                    F.substring(F.col("text"), (start + 1).cast("int"),
                                chunk_chars).alias("chunk_text"))
            .withColumn("chunk_len",
                        F.length("chunk_text").cast("bigint")))


# --- deterministic global shuffle --------------------------------------

def global_shuffle(spark: SparkSession, sf_dir: str, seed: str = "s0",
                   n_shards: int = 16) -> DataFrame:
    """Reproducible global training-order permutation: every document gets
    a content-addressed sort key (md5 of seed:doc_id), a shard
    (key mod n_shards) and a position within its shard (rank by key). Two
    runs — on any cluster size, in any engine — produce the identical
    order; changing ``seed`` gives an independent permutation (the
    epoch-reshuffle knob of a training pipeline).

    Scale: one hash shuffle on shard + an independent per-shard sort —
    the standard distributed permutation (no global sort, no
    single-partition bottleneck; shard count scales with the cluster).
    The key is md5-derived specifically so the DuckDB oracle states the
    bit-identical arithmetic (('0x'||substring(md5(..)))::BIGINT ==
    conv(substring(md5(..)),16,10))."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    key = F.conv(F.substring(
        F.md5(F.concat(F.lit(seed), F.lit(":"),
                       F.col("doc_id").cast("string"))), 1, 15),
        16, 10).cast("long")
    with_key = docs.select("doc_id", key.alias("shuffle_key"))
    shard = F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
    w = (Window.partitionBy("shard")
         .orderBy("shuffle_key", "doc_id"))
    return (with_key.withColumn("shard", shard)
            .withColumn("pos_in_shard",
                        (F.row_number().over(w) - 1).cast("long"))
            .select("doc_id", "shard", "pos_in_shard", "shuffle_key"))


# --- curriculum ordering -------------------------------------------------

def curriculum_order_df(docs: DataFrame, n_stages: int = 4,
                        seed: str = "c0", n_shards: int = 16) -> DataFrame:
    """Curriculum training order (Bengio et al., ICML'09 curriculum
    learning): stage documents easy -> hard by a corpus-RELATIVE
    difficulty signal (token count; short docs first), shuffled
    reproducibly within each stage. A trainer consumes stage 0's shards,
    then stage 1's, ... — the standard length-curriculum recipe with a
    deterministic epoch-reshuffle knob (``seed``).

    Exactness + scale, reusing two established shapes:
    - stage boundaries come from the VALUE HISTOGRAM of n_tokens (one
      row per distinct count — quality_decile_filter's trick), so the
      quantile cut is integer-exact and the only single-partition window
      runs over the tiny histogram, never the corpus. The <= n_stages
      boundary rows are CONTRACT-BOUNDED driver state compiled into a
      when-chain (zero join, codegen) — the IVF-centroid rule.
    - within-stage order is global_shuffle's content-addressed pattern:
      md5(seed:doc_id) key, shard = key mod n_shards, rank per
      (stage, shard) partition — distributed, no global sort.

    Stage semantics: boundary b_s = the smallest n_tokens value whose
    cumulative doc count reaches ceil(n*(s+1)/n_stages); a doc belongs
    to the first stage whose boundary covers it (ties on the boundary
    value all land in the same stage — no doc-level arbitrariness).
    Output (doc_id, n_tokens, stage, shard, pos_in_shard): all integers
    and md5 arithmetic, so the driver gate is a full hash."""
    from pyspark.sql import Window

    from .text import tokens_col

    spark = docs.sparkSession
    with_n = docs.select("doc_id",
                         F.size(tokens_col()).cast("bigint")
                          .alias("n_tokens"))
    hist = (with_n.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("c"))
            .withColumn("cum", F.sum("c").over(
                Window.orderBy("n_tokens")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    rows = hist.select("n_tokens", "cum").collect()   # |distinct counts|
    # the corpus total is the LARGEST cumulative count — do not rely on
    # collect() preserving the window's sort order (ADVICE r12: a plan
    # change could reorder rows and silently shift stage boundaries)
    n = max((r["cum"] for r in rows), default=0)
    bounds = []
    for st in range(n_stages):
        target = -(-n * (st + 1) // n_stages)          # ceil division
        b = min((r["n_tokens"] for r in rows if r["cum"] >= target),
                default=None)
        bounds.append(b)
    stage = F.lit(n_stages - 1).cast("int")
    for st in range(n_stages - 2, -1, -1):
        if bounds[st] is not None:
            stage = F.when(F.col("n_tokens") <= F.lit(bounds[st]),
                           F.lit(st).cast("int")).otherwise(stage)
    key = F.conv(F.substring(
        F.md5(F.concat(F.lit(seed), F.lit(":"),
                       F.col("doc_id").cast("string"))), 1, 15),
        16, 10).cast("long")
    staged = (with_n.withColumn("stage", stage)
              .withColumn("_key", key)
              .withColumn("shard",
                          F.pmod(F.col("_key"), F.lit(n_shards))
                          .cast("int")))
    w = Window.partitionBy("stage", "shard").orderBy("_key", "doc_id")
    return (staged.withColumn("pos_in_shard",
                              (F.row_number().over(w) - 1).cast("long"))
            .select("doc_id", "n_tokens", "stage", "shard",
                    "pos_in_shard"))


def curriculum_order(spark: SparkSession, sf_dir: str,
                     n_stages: int = 4, seed: str = "c0",
                     n_shards: int = 16) -> DataFrame:
    """Driver-gate fixture (full hash; ORACLES['curriculum_order'] embeds
    the pinned defaults): 4-stage length curriculum over documents."""
    if (n_stages, seed, n_shards) != (4, "c0", 16):
        raise ValueError(
            f"curriculum_order oracle pins (n_stages, seed, n_shards)="
            f"(4, 'c0', 16); got {(n_stages, seed, n_shards)} — call "
            f"curriculum_order_df directly for other settings")
    return curriculum_order_df(load(spark, sf_dir, "documents"),
                               n_stages, seed, n_shards)


# --- normalization -----------------------------------------------------

def normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text form: lowercase, collapse whitespace runs to one
    space, trim. The normalized string is what exact dedup / shingling
    should key on in a real pipeline (case or spacing variants of one
    document hash identically after this map).

    Scale: narrow per-row map, whole-stage codegen, no shuffle. (r15:
    measured WITH a spread() parallelism floor — 0.30→0.33 s — the map
    is too cheap to amortize the full-text shuffle; left narrow.)"""
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", norm.alias("norm_text"),
                       F.length(norm).cast("bigint").alias("n_chars_norm"))


# --- PII scrubbing -----------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails and IPv4 addresses with typed placeholders and count
    redactions per document. The synthetic corpus contains no PII, so the
    query plants a deterministic contact line per document first — the
    redaction path is therefore exercised on every row (a scrub proven on
    PII-free input would be vacuous), and the DuckDB oracle plants the
    identical line.

    Patterns stay within the regex intersection of Java (Spark) and RE2
    (DuckDB) dialects. Scale: per-row regexp map, no shuffle."""
    docs = spread(load(spark, sf_dir, "documents"))
    raw = F.concat(
        F.col("text"), F.lit(" Contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".1 please."))
    n_emails = F.size(F.regexp_extract_all(raw, F.lit(_EMAIL_RE), 0))
    n_ips = F.size(F.regexp_extract_all(raw, F.lit(_IPV4_RE), 0))
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _IPV4_RE, "<IP>")
    return docs.select(
        "doc_id", scrubbed.alias("scrubbed"),
        (n_emails + n_ips).cast("bigint").alias("n_redactions"))


# --- sequence packing --------------------------------------------------

def pack_sequences(spark: SparkSession, sf_dir: str, budget: int = 2048,
                   n_shards: int | None = None) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in a
    deterministic stream per shard (doc_id order) and a doc's pack is the
    training-sample window its first token falls into —
    ``floor(start_offset / budget)``. This is the GPT-style packing loop
    restated as a dataflow: (shard, pack_id, offset_in_shard) for every
    document.

    Scale: packing runs per shard (doc_id % n_shards), NOT over one global
    ordering — a global running sum would force a single-partition window
    (the classic window bottleneck); sharded windows parallelize across
    the cluster, exactly how production pipelines pack per output file.
    One shuffle on the shard key, then a sorted running sum per shard.

    ``n_shards`` defaults to the session's defaultParallelism so the
    window work spreads over every core/executor; the parameter stays for
    callers that need a fixed shard layout — the DRIVER GATE pins it
    (see __spark_entry__), because shard assignment is part of the output
    and an oracle keyed to the machine's CPU count would not be a pure
    function of the data."""
    if n_shards is None:
        n_shards = spark.sparkContext.defaultParallelism
    return pack_sequences_df(load(spark, sf_dir, "documents"), budget,
                             n_shards)


def pack_sequences_df(docs: DataFrame, budget: int = 2048,
                      n_shards: int = 16) -> DataFrame:
    """Frame form of :func:`pack_sequences`: packs any (doc_id, text)
    frame — e.g. the survivors of a streaming dedup corpus — with the
    identical layout rule, so streamed and batch corpora of the same
    content produce identical (shard, pack_id, offset) placements."""
    from pyspark.sql import Window

    # NULL text -> '' (0 tokens), matching the oracle's COALESCE: under
    # ANSI semantics size(split(NULL)) is NULL and would poison the
    # running offset sum for every later doc in the shard.
    toks = F.filter(F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"),
                    lambda x: x != "")
    base = docs.select(
        "doc_id", (F.col("doc_id") % n_shards).alias("shard"),
        F.size(toks).cast("bigint").alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return base.select(
        "doc_id", "shard", "n_tokens",
        start.alias("offset_in_shard"),
        F.floor(start / budget).cast("bigint").alias("pack_id"))


# --- source quota mixing -----------------------------------------------

def mix_by_source(spark: SparkSession, sf_dir: str,
                  quota: int = 50) -> DataFrame:
    """Domain-mixing quota selection: keep the top ``quota`` documents per
    source, ranked by length (n_chars desc, doc_id asc tiebreak — fully
    deterministic). The selection stage of a data-mixing recipe where each
    domain contributes a bounded share of the corpus.

    Scale: one hash shuffle on source + per-group top-k; with bounded
    quota Spark runs a rank window per source partition — skewed sources
    are handled by AQE, and the output is quota-bounded per key so no
    group explodes."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(),
                                             F.col("doc_id").asc())
    return (docs.select("doc_id", "source", "n_chars",
                        F.row_number().over(w).alias("rank_in_source"))
            .where(F.col("rank_in_source") <= quota))


# --- temperature mixture sampling --------------------------------------

def mix_temperature(spark: SparkSession, sf_dir: str,
                    total: int = 200) -> DataFrame:
    """Temperature-flattened mixture selection (tau = 0.5): each source's
    quota is proportional to sqrt(its doc count) — the standard
    multilingual/multi-domain flattening that upweights small sources
    relative to proportional sampling — and the quota is filled
    content-addressed (md5(doc_id) order), so membership is reproducible
    across runs and engines.

    Quotas are INTEGER-exact by construction: weight = floor(sqrt(n_s))
    (exact in double for counts < 2^52, so deterministic across engines),
    denominator = integer sum of weights, quota = max(1, weight * total
    DIV denominator). No cross-source float sum ever happens — floats
    whose summation order could flip a floor() at an integer boundary
    have no place in a selection whose output is part of a hash gate.

    Scale: one count per source (map-side combined), a 20-row broadcast
    back onto the corpus, and a per-source top-quota window — the same
    bounded-group shape as mix_by_source. The denominator is a window
    SUM over the source-count frame itself (one SinglePartition exchange
    of ~20 aggregate rows), not a separate ``.agg`` branch — a second
    branch re-triggers the corpus scan through the weights lineage."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    weights = (docs.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_docs"))
               .withColumn("w", F.floor(F.sqrt(F.col("n_docs")))
                           .cast("bigint")))
    quotas = (weights
              .withColumn("s", F.sum("w").over(Window.partitionBy(F.lit(1))))
              .select("source", "n_docs",
                      F.greatest(
                          F.lit(1).cast("bigint"),
                          F.expr(f"(w * CAST({total} AS BIGINT)) DIV s"))
                      .alias("quota")))
    key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    ranked = docs.select("doc_id", "source",
                         F.row_number().over(w).alias("sample_rank"))
    return (ranked.join(F.broadcast(quotas), "source")
            .where(F.col("sample_rank") <= F.col("quota"))
            .select("doc_id", "source", "sample_rank", "quota"))


# --- epoch-weighted mixture materialization -----------------------------

def materialize_mixture_df(docs: DataFrame,
                           epochs_millis: dict[str, int],
                           default_millis: int = 1000) -> DataFrame:
    """Materialize a training mixture with per-source EPOCH weights —
    the step after quota/temperature selection decides the recipe: a
    source weighted 2.3 epochs emits every document twice plus a
    deterministic 30% of documents a third time (the repetition-factor
    materialization of LLaMA/DoReMi-style mixtures, where upsampled
    domains repeat and downweighted ones thin out; 0 drops the source).
    Output one row per (doc_id, copy): (doc_id, source, n_copies, copy).

    Weights are INTEGER thousandths of an epoch (float-exactness
    doctrine: the fractional-copy decision is ``u * 1000 < frac * 2^32``
    over the md5-prefix integer u — pure bigint arithmetic, no float
    threshold whose rounding could flip membership between engines).
    Membership is content-addressed (md5 of doc_id), so the same doc
    gets the extra copy in every run and engine.

    Scale: a per-row scalar expression plus an explode bounded by
    ceil(epochs) — no shuffle at all; the weights map is a literal CASE
    over the (small) source domain, never a join."""
    expr = F.lit(int(default_millis)).cast("bigint")
    for src, millis in sorted(epochs_millis.items()):
        expr = F.when(F.col("source") == src,
                      F.lit(int(millis)).cast("bigint")).otherwise(expr)
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("bigint")
    base = F.expr("e div 1000")
    extra = F.when(u * 1000 < (F.col("e") % 1000) * F.lit(1 << 32), 1) \
             .otherwise(0).cast("bigint")
    out = (docs.select("doc_id", "source", expr.alias("e"))
           .withColumn("n_copies", base + extra)
           .where(F.col("n_copies") > 0)
           .select("doc_id", "source", "n_copies",
                   F.explode(F.sequence(
                       F.lit(0).cast("bigint"),
                       F.col("n_copies") - 1)).alias("copy")))
    return out


def materialize_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate fixture: src0 dropped (0 epochs), src1 upsampled 2.5
    epochs, src2 fractional 1.3, everything else the 1-epoch default —
    all four weight regimes in one output, restated verbatim by the
    DuckDB oracle."""
    return materialize_mixture_df(
        load(spark, sf_dir, "documents"),
        {"src0": 0, "src1": 2500, "src2": 1300})


# --- deterministic train/val/test split --------------------------------

def train_val_test_split(spark: SparkSession, sf_dir: str,
                         val_from: str = "e6",
                         test_from: str = "f3") -> DataFrame:
    """Content-addressed split assignment: the first two hex chars of
    md5(doc_id) place each document into train (< ``val_from``, ~90%),
    val (< ``test_from``, ~5%) or test (rest, ~5%). Like
    sample_deterministic, membership is a pure function of the key —
    stable across runs, engines, and corpus growth, so no training doc
    can ever drift into the held-out set between pipeline runs (the
    leakage mode rng-based splits suffer).

    Scale: a per-row scalar expression, no shuffle; the split column
    also serves as a partition key for writing the three sets in one
    pass (``df.write.partitionBy("split")``)."""
    docs = load(spark, sf_dir, "documents")
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (F.when(key < val_from, "train")
              .when(key < test_from, "val")
              .otherwise("test"))
    return docs.select("doc_id", key.alias("split_key"),
                       split.alias("split"), "lang", "source")


def split_by_content_df(docs: DataFrame, val_from: str = "e6",
                        test_from: str = "f3") -> DataFrame:
    """LEAKAGE-SAFE split assignment: the split key is the md5 of the
    document's CONTENT (not its id), so byte-identical duplicates land
    in the same split by construction — the held-out set can never
    contain a verbatim copy of a training document no matter how many
    times the crawler re-scraped it under different ids.
    train_val_test_split (id-keyed) cannot give this: two ids carrying
    the same text hash independently and split ~p(1-p) of the time.

    Same threshold arithmetic as the id-keyed split (first two hex
    chars of the key against hex cutoffs); NULL text hashes as '' (the
    dedup_exact convention), so the gate output is null-free.

    Scale: one scalar md5 over the text column, no shuffle — the full
    near-dup-safe variant would key on the duplicate-cluster
    representative instead (duplicate_clusters' min-id), trading the
    zero-shuffle property for CC's log-rounds."""
    key = F.substring(F.md5(F.md5(F.coalesce(F.col("text"), F.lit("")))),
                      1, 2)
    split = (F.when(key < val_from, "train")
              .when(key < test_from, "val")
              .otherwise("test"))
    return docs.select("doc_id", key.alias("split_key"),
                       split.alias("split"), "lang", "source")


def split_by_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate fixture (full hash oracle): content-keyed
    leakage-safe split of the documents table."""
    return split_by_content_df(load(spark, sf_dir, "documents"))


# --- benchmark decontamination ----------------------------------------

def _hashed_kgram_set(k: int) -> F.Column:
    """Distinct character k-grams of ``text``, each hashed to a 64-bit
    long: only 8-byte keys ever cross the contamination join (same
    discipline as dedup.py's hashed_shingle_sets_df). xxhash64 collisions
    across a benchmark's shingle vocabulary are negligible (~1e-9 at 1e5
    shingles) and can only perturb a count by 1."""
    t = F.col("text")
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(t.substr(i, F.lit(k)))))


def _bench_shingle_build(benchmark: DataFrame, k: int,
                         broadcast_max_rows: int,
                         keep_doc_id: bool = False,
                         mark_hits: bool = False):
    """Shared build side for the contamination family: the benchmark's
    hashed k-grams, persisted (the size-guard count and the join probe
    would each re-shingle the benchmark otherwise), broadcast-hinted
    only when the count of THE FRAME BEING BROADCAST is within bound —
    the guard must measure exactly what it ships, so variants that carry
    extra columns (per-doc attribution rows) are counted in that form.
    Returns (build_side, persisted_frame); callers attach the persisted
    frame to their result via cache ownership."""
    cols = ([F.col("doc_id").alias("bench_doc_id")] if keep_doc_id else [])
    sh = benchmark.select(*cols, F.explode(_hashed_kgram_set(k)).alias("s"))
    if mark_hits:
        sh = sh.withColumn("hit", F.lit(1))
    if not keep_doc_id:
        sh = sh.distinct()
    sh = sh.persist()
    build = F.broadcast(sh) if sh.count() <= broadcast_max_rows else sh
    return build, sh


def contamination_hits_df(train: DataFrame, benchmark: DataFrame,
                          k: int = 5,
                          broadcast_max_shingles: int = 2_000_000) -> DataFrame:
    """(doc_id, n_shared) for every training doc sharing >= 1 distinct
    k-gram with any benchmark text. The benchmark is an EXPLICIT bounded
    input — the eval suite — not something derived from the training
    corpus, so the broadcast decision is a contract, not a comment:
    its distinct-shingle count is measured (one count job over the
    bounded side) and the build side is broadcast only under
    ``broadcast_max_shingles`` (~16 MB of longs at the default); above
    that the join falls back to a hash-partitioned shuffle join on the
    8-byte shingle key, which scales to an arbitrarily large benchmark.

    Scale: one explode of the training corpus, one join on longs, one
    map-side-combined count per doc_id. Never collects, never broadcasts
    unmeasured input."""
    build, bench_sh = _bench_shingle_build(benchmark, k,
                                           broadcast_max_shingles)
    # parallelism floor (r15): the per-position xxhash transform +
    # array_distinct is row-local CPU off a possibly single-file scan
    train_sh = spread(train).select(
        "doc_id", F.explode(_hashed_kgram_set(k)).alias("s"))
    return owned(
        train_sh.join(build, "s")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_shared")),
        bench_sh)


def decontaminate_df(train: DataFrame, benchmark: DataFrame, k: int = 5,
                     min_overlap: int = 10,
                     broadcast_max_shingles: int = 2_000_000) -> DataFrame:
    """Flag training documents that overlap an evaluation set: a training
    doc is contaminated when it shares >= ``min_overlap`` distinct
    character k-grams with ANY benchmark text. Output: (doc_id, n_shared,
    contaminated) for every training doc, zero-overlap docs included.
    Join strategy per contamination_hits_df (size-guarded broadcast with
    shuffle fallback)."""
    hits = contamination_hits_df(train, benchmark, k, broadcast_max_shingles)
    out = (train.select("doc_id").join(hits, "doc_id", "left")
           .select("doc_id",
                   F.coalesce(F.col("n_shared"), F.lit(0).cast("bigint"))
                    .alias("n_shared"))
           .withColumn("contaminated", F.col("n_shared") >= min_overlap))
    # transfer cache ownership: the attachment rides the frame the
    # caller actually holds (cache.py contract)
    return owned(out, *persisted(hits))


def contamination_overlap_df(train: DataFrame, benchmark: DataFrame,
                             k: int = 5,
                             broadcast_max_shingles: int = 2_000_000
                             ) -> DataFrame:
    """Graded contamination signal: for every training document, the
    FRACTION of its distinct character k-grams that appear anywhere in
    the benchmark — the score a curation run thresholds or buckets,
    where decontaminate_df only gives the binary verdict. Output:
    (doc_id, n_grams, n_shared, overlap_frac); overlap_frac is the
    single division n_shared/n_grams of exact integers (0.0 for a doc
    shorter than k, which contributes its whole text as one gram — the
    guard in _hashed_kgram_set keeps n_grams >= 1).

    Scale: identical join discipline to contamination_hits_df
    (size-guarded broadcast of the bounded benchmark shingle set, hash
    join on 8-byte keys otherwise); the per-doc gram count is a row-local
    expression, no extra shuffle."""
    build, bench_sh = _bench_shingle_build(benchmark, k,
                                           broadcast_max_shingles,
                                           mark_hits=True)
    # ONE shingle pass serves both the denominator and the hit count:
    # left-join each distinct train gram against the benchmark set, then
    # a single aggregation per doc
    train_sh = spread(train).select(
        "doc_id", F.explode(_hashed_kgram_set(k)).alias("s"))
    out = (train_sh.join(build, "s", "left")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_grams"),
                F.count("hit").alias("n_shared"))
           .withColumn("overlap_frac",
                       F.col("n_shared").cast("double")
                       / F.col("n_grams").cast("double")))
    return owned(out, bench_sh)


def contamination_overlap(spark: SparkSession, sf_dir: str,
                          k: int = 5) -> DataFrame:
    """Driver-gate fixture: same every-50th-doc benchmark split as
    decontaminate, but emitting the graded per-doc overlap fraction."""
    docs = load(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 50 == 0
    return contamination_overlap_df(docs.where(~is_bench),
                                    docs.where(is_bench), k)


def contamination_attribution_df(train: DataFrame, benchmark: DataFrame,
                                 k: int = 5,
                                 broadcast_max_shingles: int = 2_000_000
                                 ) -> DataFrame:
    """WHICH benchmark document contaminated each training document: for
    every training doc sharing >= 1 distinct k-gram with the benchmark,
    the benchmark doc with the largest shared-distinct-gram count
    (ties -> smallest bench_doc_id). The audit trail a decontamination
    report needs — 'dropped because of eval doc X', not just 'dropped'.

    Scale: unlike contamination_hits_df the benchmark side keeps its
    doc_id (the join key is still the 8-byte gram hash, the build side is
    still size-guarded broadcast); the groupBy is (train doc, bench doc)
    — bounded by actual overlap, not the cross product — and the final
    argmax runs on that aggregate-sized frame. Cost model: the join
    fan-out is sum over grams of (train docs containing it) x (bench
    docs containing it), so ``k`` must be large enough that grams are
    DISCRIMINATIVE — a k so small that every doc shares every gram
    degenerates toward |train| x |bench|. Pick k at or above the
    decontamination overlap threshold's gram length (the operator is a
    drill-down on flagged docs, not a replacement for the cheap
    distinct-gram-set screen in contamination_hits_df)."""
    from .extremum import argmax

    build, bench_sh = _bench_shingle_build(benchmark, k,
                                           broadcast_max_shingles,
                                           keep_doc_id=True)
    train_sh = spread(train).select(
        "doc_id", F.explode(_hashed_kgram_set(k)).alias("s"))
    pair_counts = (train_sh.join(build, "s")
                   .groupBy("doc_id", "bench_doc_id")
                   .agg(F.count(F.lit(1)).alias("n_shared")))
    return owned(argmax(pair_counts, "n_shared",
                        group_cols=["doc_id"],
                        tiebreak_cols=["bench_doc_id"]),
                 bench_sh)


def contamination_attribution(spark: SparkSession, sf_dir: str,
                              k: int = 12) -> DataFrame:
    """Driver-gate fixture: every-50th-doc benchmark split; top
    contaminating benchmark doc per affected training doc. k=12 (vs the
    k=5 screen): the synthetic corpus is token soup over a ~30-word
    vocabulary, so 5-char grams occur in essentially every document and
    the per-(train, bench) fan-out degenerates (see cost model above);
    12-char grams span 2-3 tokens and are discriminative."""
    docs = load(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 50 == 0
    return contamination_attribution_df(docs.where(~is_bench),
                                        docs.where(is_bench), k)


def decontaminate(spark: SparkSession, sf_dir: str, k: int = 5,
                  min_overlap: int = 10) -> DataFrame:
    """Driver-gate fixture: every 50th document plays the held-out
    benchmark, the rest are the training corpus — a deterministic split
    the DuckDB oracle restates exactly (the oracle keeps raw-string
    k-grams; the engine joins on xxhash64 longs, which leaves the
    n_shared counts identical). Real pipelines call decontaminate_df with
    the actual eval-suite frame."""
    docs = load(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 50 == 0
    return decontaminate_df(docs.where(~is_bench), docs.where(is_bench),
                            k, min_overlap)


# --- packing efficiency report ------------------------------------------

def pack_efficiency_df(docs: DataFrame, budget: int = 2048,
                       n_shards: int = 16) -> DataFrame:
    """Per-shard packing utilization for the concat-and-cut layout of
    :func:`pack_sequences_df` — the report a training job reads before
    committing GPU-hours to a corpus: how many fixed-``budget`` samples
    each shard yields and how much of the final sample is padding.

    Under concat-and-cut the token stream is gapless, so per shard:
      n_packs      = ceil_div(total_tokens, budget)  (0 tokens -> 0 packs)
      waste_tokens = n_packs * budget - total_tokens (tail padding only)
      utilization  = total_tokens / (n_packs * budget)  (1.0 when empty)
    All integers until the single final division (float-exactness
    doctrine): ceil_div is bigint ``(total + budget - 1) div budget``,
    exact for ANY token total — a double-ceil would drift above 2^53
    tokens, which a 100 TB corpus exceeds. One map-side-combined
    aggregation on the shard key — the same single shuffle as the packer
    itself."""
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    per_shard = (docs
                 .select((F.col("doc_id") % n_shards).alias("shard"),
                         F.size(toks).cast("bigint").alias("n_tokens"))
                 .groupBy("shard")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("n_tokens").alias("total_tokens")))
    n_packs = F.expr(
        f"(total_tokens + {int(budget) - 1}) div {int(budget)}")
    return (per_shard
            .withColumn("n_packs", n_packs)
            .withColumn("waste_tokens",
                        F.col("n_packs") * budget - F.col("total_tokens"))
            .withColumn("utilization",
                        F.when(F.col("n_packs") == 0, F.lit(1.0))
                         .otherwise(F.col("total_tokens").cast("double")
                                    / (F.col("n_packs") * budget)
                                    .cast("double"))))


def pack_efficiency(spark: SparkSession, sf_dir: str, budget: int = 2048,
                    n_shards: int = 16) -> DataFrame:
    """Driver-gate fixture: packing report over the documents table with
    the gate's pinned shard layout."""
    return pack_efficiency_df(load(spark, sf_dir, "documents"), budget,
                              n_shards)


# --- corpus snapshot diff ------------------------------------------------

def corpus_diff_df(old: DataFrame, new: DataFrame) -> DataFrame:
    """Training-data versioning: diff two corpus snapshots by content
    hash. Output one row per doc_id present in either snapshot with
    status 'added' / 'removed' / 'changed' / 'unchanged' — the audit
    a pipeline publishes alongside a refreshed corpus so downstream
    consumers know exactly what moved (and reproducibility reviews can
    anti-join 'changed' against release notes).

    Scale: both sides reduce to (doc_id, md5) projections before the
    full outer join — content never crosses the shuffle, the join key is
    the natural primary key, and the output is one narrow row per doc."""
    oh = old.select("doc_id",
                    F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("old_h"))
    nh = new.select("doc_id",
                    F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("new_h"))
    status = (F.when(F.col("old_h").isNull(), F.lit("added"))
               .when(F.col("new_h").isNull(), F.lit("removed"))
               .when(F.col("old_h") == F.col("new_h"), F.lit("unchanged"))
               .otherwise(F.lit("changed")))
    return (oh.join(nh, "doc_id", "full_outer")
              .select("doc_id", status.alias("status"),
                      F.coalesce("old_h", F.lit("")).alias("old_h"),
                      F.coalesce("new_h", F.lit("")).alias("new_h")))


def mutated_snapshot(docs: DataFrame) -> DataFrame:
    """THE deterministic next-snapshot mutation both snapshot-comparison
    gates (corpus_diff, text.vocab_drift) diff against — one definition,
    so the cross-fixture 'same mutation' claim is structural: every 13th
    doc removed, every surviving 7th edited (' rev2' appended), every
    11th re-added under a +1e6-shifted id. The oracles restate it in
    SQL (unavoidable duplication; this is the single Spark copy)."""
    kept = docs.where(F.col("doc_id") % 13 != 0)
    edited = kept.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" rev2")))
         .otherwise(F.col("text")).alias("text"))
    added = (docs.where(F.col("doc_id") % 11 == 0)
             .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    return edited.unionByName(added)


def corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate fixture: documents vs the shared deterministic
    mutation (``mutated_snapshot``) — all four statuses appear and the
    DuckDB oracle restates the mutation exactly."""
    docs = load(spark, sf_dir, "documents")
    return corpus_diff_df(docs, mutated_snapshot(docs))


def source_overlap_matrix_df(docs: DataFrame) -> DataFrame:
    """Cross-source exact-duplicate overlap matrix — the mixture-design
    diagnostic that materialize_mixture's weights should be corrected
    by: if source A largely duplicates source B, their nominal mixture
    weights double-count the shared content. For every unordered source
    pair (source_a <= source_b) the output counts exact-duplicate DOC
    PAIRS: a text duplicated c_a times in A and c_b times in B
    contributes c_a*c_b cross pairs, and c*(c-1)/2 within-source pairs
    on the diagonal — all exact bigint arithmetic (the half product is
    an integer ceil-free div of an even product).

    Output: (source_a, source_b, n_dup_pairs), rows only where pairs
    exist.

    Scale: one groupBy on the 16-byte digest (map-side combined), then a
    digest-key self-join whose per-digest group size is the source
    count — bounded by |sources|, never by corpus size; the final agg
    has |sources|^2 keys."""
    d = (docs.select(F.md5(F.coalesce(F.col("text"), F.lit("")))
                     .alias("dig"), "source")
             .groupBy("dig", "source")
             .agg(F.count(F.lit(1)).alias("n")))
    a = d.select("dig", F.col("source").alias("source_a"),
                 F.col("n").alias("n_a"))
    b = d.select("dig", F.col("source").alias("source_b"),
                 F.col("n").alias("n_b"))
    joined = a.join(b, "dig").where(F.col("source_a") <= F.col("source_b"))
    # integer div, not float /: the product is even so a double divide
    # happens to be exact below 2^53, but bigint div is exact everywhere
    pairs = F.when(
        F.col("source_a") == F.col("source_b"),
        F.expr("(n_a * (n_a - 1)) div 2")
    ).otherwise(F.col("n_a") * F.col("n_b")).cast("bigint")
    return (joined.select("source_a", "source_b", pairs.alias("p"))
            .groupBy("source_a", "source_b")
            .agg(F.sum("p").alias("n_dup_pairs"))
            .where(F.col("n_dup_pairs") > 0))


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate fixture: the synthetic corpus has NO exact duplicates
    (every text is unique), so the fixture unions a 'rescrape' source —
    every 10th doc verbatim under a new label (the common real-world
    shape: a later crawl re-collecting earlier content) — making the
    off-diagonal cells non-empty. The oracle restates the same union."""
    docs = load(spark, sf_dir, "documents")
    rescrape = (docs.where(F.col("doc_id") % 10 == 0)
                    .select((F.col("doc_id") + F.lit(10_000_000))
                            .alias("doc_id"),
                            "text", "lang", F.lit("rescrape").alias("source"),
                            "n_chars"))
    return source_overlap_matrix_df(docs.unionByName(rescrape))


def domain_mixture_report_df(docs: DataFrame) -> DataFrame:
    """Per-source (domain) mixture report — the table a mixture designer
    reads before setting sampling weights: document count, exact token
    mass, exact-distinct text count, within-source duplicate ratio, and
    the source's share of corpus token mass. All counts are exact
    bigints; the two ratios are each ONE IEEE division of exact
    integers, so the whole report hash-matches the SQL oracle.

    Output: (source, n_docs, n_tokens, n_distinct_texts, dup_ratio,
    token_share).

    Scale: one map-side-combined agg keyed by (source, digest) to get
    distinct counts without count(distinct)'s expand, one re-agg by
    source (|sources| keys), and the corpus token total rides a
    broadcast of a 1-row aggregate — no unbounded driver state."""
    from .text import tokens_col

    per_text = (docs.select(
                    "source",
                    F.md5(F.coalesce(F.col("text"), F.lit("")))
                     .alias("dig"),
                    F.size(tokens_col()).cast("bigint").alias("n_tokens"))
                .groupBy("source", "dig")
                .agg(F.count(F.lit(1)).alias("n_copies"),
                     F.sum("n_tokens").alias("tok")))
    per_src = (per_text.groupBy("source")
               .agg(F.sum("n_copies").cast("bigint").alias("n_docs"),
                    F.sum("tok").cast("bigint").alias("n_tokens"),
                    F.count(F.lit(1)).cast("bigint")
                     .alias("n_distinct_texts")))
    total = per_src.agg(F.sum("n_tokens").alias("total_tokens"))
    return (per_src.crossJoin(F.broadcast(total))
            .select(
                "source", "n_docs", "n_tokens", "n_distinct_texts",
                F.when(F.col("n_docs") == 0, F.lit(0.0))
                 .otherwise((F.col("n_docs") - F.col("n_distinct_texts"))
                            .cast("double") / F.col("n_docs").cast("double"))
                 .alias("dup_ratio"),
                F.when(F.col("total_tokens") == 0, F.lit(0.0))
                 .otherwise(F.col("n_tokens").cast("double")
                            / F.col("total_tokens").cast("double"))
                 .alias("token_share")))


def domain_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate fixture: the synthetic corpus has no exact
    duplicates, so every 20th document is re-planted VERBATIM under its
    own source (a within-domain recrawl) — giving dup_ratio real signal
    in the sources that caught a replant. Full hash oracle restating
    the same union."""
    docs = load(spark, sf_dir, "documents")
    replant = (docs.where(F.col("doc_id") % 20 == 0)
                   .select((F.col("doc_id") + F.lit(20_000_000))
                           .alias("doc_id"),
                           "text", "lang", "source", "n_chars"))
    return domain_mixture_report_df(docs.unionByName(replant))


def select_token_budget_df(docs: DataFrame, budget: int = 20_000,
                           min_count: int = 2,
                           n_buckets: int = 1000) -> DataFrame:
    """Quality-greedy corpus selection under a token budget — 'take the
    best documents until the token budget is spent', the selection step
    of a data-constrained training run. Quality = the bigram corpus
    familiarity score (text.ngram_lm_score_df); docs are taken in
    (familiarity desc, doc_id asc) order until cumulative whitespace
    tokens exceed ``budget``.

    A naive greedy is a GLOBAL ordered running sum — one total-order
    sort, inherently serial. This is the scalable two-pass restatement:

      pass 1  docs bucket by floor(familiarity * n_buckets); per-bucket
              token sums aggregate to <= n_buckets+1 rows, whose
              descending cumulative sum finds each bucket's status:
              fully-in (fits under budget with all better buckets),
              boundary (straddles the budget), or out. The only ordered
              window runs over that bounded bucket frame.
      pass 2  ONLY the single boundary bucket's docs get a per-doc
              ordered cumulative sum (partitioned by bucket — bounded
              input); everything else takes its verdict straight from
              the bucket status via a broadcast join.

    The result is EXACTLY the global greedy's selection (bucket order
    refines to doc order inside the boundary bucket; n_buckets bounds
    the boundary partition — recurse the same split if one bucket is
    still too wide). Output: every doc with (doc_id, n_tokens,
    familiarity, selected). All floats are single-expression products
    of exact integers — full hash oracle."""
    from pyspark.sql import Window

    from .text import ngram_lm_score_df, tokens_col

    lm = ngram_lm_score_df(docs, min_count).select("doc_id", "familiarity")
    toks = docs.select(
        "doc_id", F.size(tokens_col()).cast("bigint").alias("n_tokens"))
    # the scored frame feeds THREE consumers (bucket totals, the
    # fully-decided core, the boundary-bucket cumsum) — without a
    # persist each one recomputes the whole ngram_lm_score_df subtree
    # (two corpus passes + a bigram join) from scratch (VERDICT r7 ask
    # #6). Per-doc scalars only: |docs| x 4 columns, far smaller than
    # the corpus. Ownership rides the result via cache.owned.
    s = (toks.join(lm, "doc_id")
         .withColumn("bucket",
                     F.floor(F.col("familiarity") * n_buckets).cast("int"))
         .persist())
    btot = s.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    # ordered window over the BUCKET frame only (<= n_buckets+1 rows)
    wb = (Window.orderBy(F.col("bucket").desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    bstat = (btot
             .withColumn("cum_before",
                         F.coalesce(F.sum("btok").over(wb),
                                    F.lit(0).cast("bigint")))
             .select("bucket", "cum_before",
                     (F.col("cum_before") + F.col("btok") <= budget)
                     .alias("full_in"),
                     (F.col("cum_before") < budget).alias("touches")))
    j = s.join(F.broadcast(bstat), "bucket")
    core = (j.where(F.col("full_in") | ~F.col("touches"))
            .select("doc_id", "n_tokens", "familiarity",
                    F.col("full_in").alias("selected")))
    wd = (Window.partitionBy("bucket")
          .orderBy(F.col("familiarity").desc(), F.col("doc_id").asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    bnd = (j.where(F.col("touches") & ~F.col("full_in"))
           .withColumn("cum", F.sum("n_tokens").over(wd))
           .select("doc_id", "n_tokens", "familiarity",
                   (F.col("cum_before") + F.col("cum") <= budget)
                   .alias("selected")))
    return owned(core.unionByName(bnd), s)


def select_token_budget(spark: SparkSession, sf_dir: str,
                        budget: int = 20_000) -> DataFrame:
    """Driver-gate fixture: budgeted quality-greedy selection over the
    documents table (the default budget is ~half the sf0.001 corpus's
    token mass, so kept, boundary, and dropped branches all run)."""
    return select_token_budget_df(load(spark, sf_dir, "documents"), budget)
