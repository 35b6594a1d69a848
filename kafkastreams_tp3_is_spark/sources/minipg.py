"""Minimal pure-stdlib PostgreSQL driver for the OPT-IN live-Postgres
e2e (tests/test_postgres_e2e.py) — just enough DBAPI surface for
``sources/jdbc.py`` (``connect() -> cursor()/commit()/close()``;
``cursor.execute(sql, params)/description/fetchall()``) when the real
drivers (psycopg2/psycopg/pg8000) are not installed and cannot be (the
build environment forbids installs but DOES ship Postgres server
binaries, so the e2e can run against a genuine local server).

Implements the public PostgreSQL frontend/backend protocol v3
(https://www.postgresql.org/docs/current/protocol.html), SIMPLE QUERY
flow only:

  StartupMessage -> Authentication (trust / cleartext / md5) ->
  ParameterStatus*/BackendKeyData -> ReadyForQuery; per execute:
  Query('Q') -> RowDescription('T')? DataRow('D')* CommandComplete('C')
  -> ReadyForQuery('Z'), with ErrorResponse('E') raised and the aborted
  transaction rolled back.

Parameters use ``format`` paramstyle (%s — matching what jdbc.py
renders for Postgres) and are interpolated CLIENT-SIDE with literal
quoting ('' doubling; standard_conforming_strings is the server
default) — acceptable for a test driver whose inputs are the suite's
own typed values, NOT a general SQL-injection-safe binding (production
uses a real driver with server-side binds; jdbc.py's docstring says
so). Values decode from the text format by type OID for the types the
sink/source schemas produce (bool/int2/int4/int8/float4/float8/
numeric/text/varchar).

SCRAM-SHA-256 auth is intentionally not implemented — the local e2e
harness (scripts/pg_e2e_local.py) initdb's with trust auth; point the
DSN at a SCRAM-only server and this module raises with a clear message
to install a real driver instead.
"""

from __future__ import annotations

import hashlib
import socket
import struct

apilevel = "2.0"
threadsafety = 1
paramstyle = "format"


class Error(Exception):
    pass


_DECODERS = {
    16: lambda s: s == "t",                 # bool
    20: int, 21: int, 23: int,              # int8 / int2 / int4
    700: float, 701: float, 1700: float,    # float4 / float8 / numeric
    25: str, 1043: str, 19: str, 18: str,   # text / varchar / name / char
}


def _quote(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v)
    if "\x00" in s:
        raise Error("NUL byte in string literal")
    return "'" + s.replace("'", "''") + "'"


def _parse_dsn(dsn: str) -> dict:
    out = {}
    for part in dsn.split():
        k, _, v = part.partition("=")
        out[k] = v
    return out


class Cursor:
    def __init__(self, conn: "Connection"):
        self._conn = conn
        self.description = None
        self._rows: list[tuple] = []

    def execute(self, sql: str, params=None) -> None:
        if params is not None:
            sql = sql % tuple(_quote(p) for p in params)
        self.description, self._rows = self._conn._query(sql)

    def fetchall(self) -> list[tuple]:
        return list(self._rows)

    def fetchone(self):
        return self._rows.pop(0) if self._rows else None

    def close(self) -> None:
        self._rows = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __iter__(self):
        return iter(list(self._rows))


class Connection:
    def __init__(self, dsn: str):
        p = _parse_dsn(dsn)
        host = p.get("host", "/tmp")
        port = int(p.get("port", "5432"))
        self._user = p.get("user", "postgres")
        self._password = p.get("password", "")
        dbname = p.get("dbname", self._user)
        if host.startswith("/"):
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.connect(f"{host}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection((host, port))
        self._buf = b""
        self._in_tx = False
        body = (b"user\x00" + self._user.encode() + b"\x00"
                b"database\x00" + dbname.encode() + b"\x00\x00")
        self._send_raw(struct.pack("!ii", 8 + len(body), 196608) + body)
        self._handshake()

    # --- wire helpers ----------------------------------------------------
    def _send_raw(self, data: bytes) -> None:
        self._sock.sendall(data)

    def _send(self, typ: bytes, body: bytes) -> None:
        self._sock.sendall(typ + struct.pack("!i", 4 + len(body)) + body)

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise Error("server closed the connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_msg(self) -> tuple[bytes, bytes]:
        typ = self._read_exact(1)
        (length,) = struct.unpack("!i", self._read_exact(4))
        return typ, self._read_exact(length - 4)

    @staticmethod
    def _error_message(body: bytes) -> str:
        msg, sev = "", ""
        i = 0
        while i < len(body) and body[i:i + 1] != b"\x00":
            code = body[i:i + 1]
            end = body.index(b"\x00", i + 1)
            val = body[i + 1:end].decode("utf-8", "replace")
            if code == b"M":
                msg = val
            elif code == b"S":
                sev = val
            i = end + 1
        return f"{sev}: {msg}" if sev else msg

    # --- session ----------------------------------------------------------
    def _handshake(self) -> None:
        while True:
            typ, body = self._read_msg()
            if typ == b"R":
                (code,) = struct.unpack("!i", body[:4])
                if code == 0:
                    continue
                if code == 3:          # cleartext password
                    self._send(b"p", self._password.encode() + b"\x00")
                elif code == 5:        # md5
                    salt = body[4:8]
                    inner = hashlib.md5(
                        self._password.encode() + self._user.encode()
                    ).hexdigest().encode()
                    outer = hashlib.md5(inner + salt).hexdigest()
                    self._send(b"p", b"md5" + outer.encode() + b"\x00")
                else:
                    raise Error(
                        f"unsupported auth method {code} (minipg speaks "
                        "trust/cleartext/md5 only — use a trust-auth "
                        "local server, scripts/pg_e2e_local.py, or "
                        "install a real driver)")
            elif typ in (b"S", b"K", b"N"):
                continue               # ParameterStatus/KeyData/Notice
            elif typ == b"E":
                raise Error(self._error_message(body))
            elif typ == b"Z":
                return
            else:
                raise Error(f"unexpected message {typ!r} during startup")

    def _query(self, sql: str) -> tuple[list | None, list[tuple]]:
        if not self._in_tx:
            self._simple("BEGIN")
            self._in_tx = True
        return self._simple(sql)

    def _simple(self, sql: str) -> tuple[list | None, list[tuple]]:
        self._send(b"Q", sql.encode() + b"\x00")
        description, rows, decoders, err = None, [], [], None
        while True:
            typ, body = self._read_msg()
            if typ == b"T":
                (nf,) = struct.unpack("!h", body[:2])
                description, decoders, i = [], [], 2
                for _ in range(nf):
                    end = body.index(b"\x00", i)
                    name = body[i:end].decode()
                    (typoid,) = struct.unpack("!i", body[end + 7:end + 11])
                    description.append(
                        (name, typoid, None, None, None, None, None))
                    decoders.append(_DECODERS.get(typoid, str))
                    i = end + 19
            elif typ == b"D":
                (nf,) = struct.unpack("!h", body[:2])
                vals, i = [], 2
                for j in range(nf):
                    (ln,) = struct.unpack("!i", body[i:i + 4])
                    i += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(decoders[j](body[i:i + ln].decode()))
                        i += ln
                rows.append(tuple(vals))
            elif typ in (b"C", b"I", b"N", b"S"):
                continue  # CommandComplete/EmptyQuery/Notice/ParamStatus
            elif typ == b"E":
                err = Error(self._error_message(body))
            elif typ == b"Z":
                if err is not None:
                    # the failed statement aborted the transaction —
                    # roll it back so the connection stays usable
                    self._in_tx = False
                    self._send(b"Q", b"ROLLBACK\x00")
                    while self._read_msg()[0] != b"Z":
                        pass
                    raise err
                return description, rows
            else:
                raise Error(f"unexpected message {typ!r} in query flow")

    # --- DBAPI surface ------------------------------------------------------
    def cursor(self) -> Cursor:
        return Cursor(self)

    def commit(self) -> None:
        if self._in_tx:
            self._simple("COMMIT")
            self._in_tx = False

    def rollback(self) -> None:
        if self._in_tx:
            self._simple("ROLLBACK")
            self._in_tx = False

    def close(self) -> None:
        try:
            if self._in_tx:
                self.rollback()
            self._send(b"X", b"")
        except Exception:
            pass
        finally:
            self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.commit()
        else:
            self.rollback()
        return False


def connect(dsn: str) -> Connection:
    return Connection(dsn)
