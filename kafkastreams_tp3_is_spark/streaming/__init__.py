"""Streaming execution layer: Connect-envelope rendering (SURVEY S5/S6),
file-source streaming inputs, the update-mode emission path (W4), and the
foreachBatch recompute harness that runs every Q1-Q13 logic function
continuously (the agg-join/agg-over-agg strategy SURVEY section 4 calls
for)."""
