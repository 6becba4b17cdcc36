"""Minimal pure-stdlib PostgreSQL client (frontend/backend protocol v3,
simple-query mode) — enough DB-API surface for the upsert sinks.

Why this exists: the reference loads into Postgres/Supabase with asyncpg
(supabase_loader.py:182-249, loader.py:202-278), but this container ships
no psycopg/pg8000/JDBC-postgres driver — only the server binaries. Rather
than leave the Postgres dialect untested (r3's last gap), this module
speaks the documented wire protocol directly over a local unix socket:
startup → (trust) AuthenticationOk → Query → RowDescription/DataRow/
CommandComplete → ReadyForQuery. ~200 lines, stdlib ``socket``+``struct``
only.

Scope and limits (deliberate):

- **Simple query protocol only** — statements are sent as text; parameters
  are client-side-substituted with conservative literal escaping
  (``standard_conforming_strings=on`` semantics: single quotes doubled,
  bytes as hex ``bytea``). Fine for tests and the chunked upsert sinks;
  a production deployment uses a real driver with server-side binding.
- **Trust/unix-socket auth only** — no MD5/SCRAM; the target is the
  test-local cluster, not a remote service.
- Result values arrive as text; a small OID table converts ints, floats,
  bools, and NULLs — everything else stays ``str``.

The sinks (`sinks.jdbc_upsert_writer[_distributed]`) accept any factory
returning an object with ``execute``/``executemany``/``commit``/
``rollback``/``close`` — ``connect`` below is exactly that, so the SAME
writer code that runs against DuckDB/Derby in the other tests runs against
a genuine Postgres 15 here, ON CONFLICT dialect and all.
"""

from __future__ import annotations

import socket
import struct
from datetime import date, datetime

# type OIDs worth converting (pg_type.dat — stable since forever)
_OID_BOOL = 16
_OID_INTS = {20, 21, 23, 26}
_OID_FLOATS = {700, 701, 1700}


class PgError(Exception):
    """Server ErrorResponse, with the SQLSTATE code and primary message."""

    def __init__(self, fields: dict[str, str]):
        self.sqlstate = fields.get("C", "")
        super().__init__(f"[{self.sqlstate}] {fields.get('M', 'unknown error')}")


def _literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return "'\\x" + bytes(v).hex() + "'::bytea"
    if isinstance(v, (datetime, date)):
        return "'" + v.isoformat() + "'"
    return "'" + str(v).replace("'", "''") + "'"


def _bind(sql: str, params) -> str:
    """Substitute ``?`` placeholders (the dialect the sink SQL builder
    emits) with escaped literals — naive split is safe because the
    generated statements never contain ``?`` inside string literals."""
    if params is None:
        return sql
    parts = sql.split("?")
    if len(parts) - 1 != len(params):
        raise ValueError(f"statement has {len(parts) - 1} placeholders, got {len(params)} params")
    out = [parts[0]]
    for part, v in zip(parts[1:], params):
        out.append(_literal(v))
        out.append(part)
    return "".join(out)


class PgConnection:
    """One socket, DB-API-ish. Transactions are explicit: the first
    ``execute``/``executemany`` sends BEGIN; ``commit``/``rollback`` end it."""

    def __init__(self, socket_dir: str, user: str = "postgres", database: str = "postgres", port: int = 5432):
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.connect(f"{socket_dir}/.s.PGSQL.{port}")
        self._buf = b""
        self._in_txn = False
        self.description: list[tuple] | None = None
        self._rows: list[tuple] = []
        params = f"user\0{user}\0database\0{database}\0\0".encode()
        payload = struct.pack("!I", 196608) + params  # protocol 3.0
        self._sock.sendall(struct.pack("!I", len(payload) + 4) + payload)
        self._drain_until_ready(startup=True)

    # -- wire plumbing -----------------------------------------------------
    def _recv_msg(self) -> tuple[bytes, bytes]:
        while len(self._buf) < 5:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("server closed connection")
            self._buf += chunk
        mtype = self._buf[0:1]
        (size,) = struct.unpack("!I", self._buf[1:5])
        while len(self._buf) < 1 + size:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("server closed connection")
            self._buf += chunk
        body = self._buf[5 : 1 + size]
        self._buf = self._buf[1 + size :]
        return mtype, body

    def _drain_until_ready(self, startup: bool = False):
        err = None
        while True:
            mtype, body = self._recv_msg()
            if mtype == b"R":  # Authentication*
                (code,) = struct.unpack("!I", body[:4])
                if code != 0:
                    raise NotImplementedError(
                        f"server demands auth method {code}; only trust (0) is supported"
                    )
            elif mtype == b"T":  # RowDescription
                (nfields,) = struct.unpack("!H", body[:2])
                pos, desc = 2, []
                for _ in range(nfields):
                    end = body.index(b"\0", pos)
                    name = body[pos:end].decode()
                    _, _, type_oid, _, _, _ = struct.unpack("!IHIHiH", body[end + 1 : end + 19])
                    desc.append((name, type_oid, None, None, None, None, None))
                    pos = end + 19
                self.description = desc
                self._rows = []
            elif mtype == b"D":  # DataRow
                (nfields,) = struct.unpack("!H", body[:2])
                pos, row = 2, []
                for i in range(nfields):
                    (flen,) = struct.unpack("!i", body[pos : pos + 4])
                    pos += 4
                    if flen == -1:
                        row.append(None)
                        continue
                    text = body[pos : pos + flen].decode()
                    pos += flen
                    oid = self.description[i][1] if self.description else 0
                    if oid in _OID_INTS:
                        row.append(int(text))
                    elif oid in _OID_FLOATS:
                        row.append(float(text))
                    elif oid == _OID_BOOL:
                        row.append(text == "t")
                    else:
                        row.append(text)
                self._rows.append(tuple(row))
            elif mtype == b"E":  # ErrorResponse
                fields, pos = {}, 0
                while pos < len(body) and body[pos : pos + 1] != b"\0":
                    end = body.index(b"\0", pos + 1)
                    fields[body[pos : pos + 1].decode()] = body[pos + 1 : end].decode()
                    pos = end + 1
                err = PgError(fields)
            elif mtype == b"Z":  # ReadyForQuery
                if err is not None:
                    raise err
                return
            # 'S' ParameterStatus, 'K' BackendKeyData, 'C' CommandComplete,
            # 'N' NoticeResponse, 'I'/'n' empty/no-data: nothing to keep

    def _query(self, sql: str):
        payload = sql.encode() + b"\0"
        self._sock.sendall(b"Q" + struct.pack("!I", len(payload) + 4) + payload)
        self._drain_until_ready()

    # -- DB-API-ish surface ------------------------------------------------
    def _ensure_txn(self):
        if not self._in_txn:
            self._query("BEGIN")
            self._in_txn = True

    def execute(self, sql: str, params=None) -> "PgConnection":
        self._ensure_txn()
        self.description = None
        self._query(_bind(sql, params))
        return self

    def executemany(self, sql: str, seq_of_params) -> "PgConnection":
        self._ensure_txn()
        stmts = [_bind(sql, p) for p in seq_of_params]
        if stmts:
            self._query(";\n".join(stmts))
        return self

    def fetchall(self) -> list[tuple]:
        return list(self._rows)

    def fetchone(self):
        return self._rows[0] if self._rows else None

    def commit(self):
        if self._in_txn:
            self._query("COMMIT")
            self._in_txn = False

    def rollback(self):
        if self._in_txn:
            self._query("ROLLBACK")
            self._in_txn = False

    def close(self):
        try:
            self._sock.sendall(b"X" + struct.pack("!I", 4))  # Terminate
        except OSError:
            pass
        self._sock.close()


def connect(socket_dir: str, user: str = "postgres", database: str = "postgres", port: int = 5432) -> PgConnection:
    return PgConnection(socket_dir, user, database, port)


def connector(socket_dir: str, user: str = "postgres", database: str = "postgres", port: int = 5432):
    """Picklable zero-arg connection factory for the executor-side sinks
    (``functools.partial`` of a package-level function serializes by
    reference, so Spark workers can rebuild it without the caller's
    module)."""
    import functools

    return functools.partial(connect, socket_dir, user, database, port)
