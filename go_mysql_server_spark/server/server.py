"""MySQL wire-protocol server front for the Engine.

A user of the reference embeds its engine behind a TCP front that any
MySQL client can dial (reference server/server.go:65 NewServer,
server/handler.go:346 ComQuery, :114 ComInitDB); this is the same
surface over the Spark-backed Engine: handshake-v10 + auth acceptance,
then the text command phase (COM_QUERY / COM_INIT_DB / COM_PING /
COM_QUIT / COM_STATISTICS / COM_RESET_CONNECTION).

Execution model: one shared Engine (the catalog is server-global, as in
the reference), with statement execution serialized behind a lock —
Spark drives the actual parallelism inside each statement across its
executors, so concurrent protocol connections interleave statements
rather than threads. Session state (USE database, @vars) follows the
engine's single-session model; this is the documented embedding cap
(SCALE.md), not a protocol cap.
"""

from __future__ import annotations

import os
import socket
import socketserver
import struct
import threading

from ..engine import Engine, OkResult, SqlError
from . import protocol as p


class MySQLServer:
    """Serve `engine` on host:port. Start with .start() (daemon threads),
    stop with .close(). Port 0 picks an ephemeral port (see .port)."""

    def __init__(self, engine: Engine, host: str = "127.0.0.1",
                 port: int = 3306, server_version: str =
                 "8.0.33-go-mysql-server-spark"):
        self.engine = engine
        self.server_version = server_version
        self._lock = threading.Lock()
        self._next_conn_id = 1
        outer = self

        class _Handler(socketserver.BaseRequestHandler):
            def handle(self):  # noqa: D401
                outer._serve_connection(self.request)

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._tcp = _Server((host, port), _Handler)
        self.host, self.port = self._tcp.server_address[:2]
        self._thread: threading.Thread | None = None

    # -- lifecycle (reference server/server.go:220 Start, :239 Close)

    def start(self) -> "MySQLServer":
        self._thread = threading.Thread(
            target=self._tcp.serve_forever, kwargs={"poll_interval": 0.05},
            daemon=True, name=f"mysql-server-{self.port}")
        self._thread.start()
        return self

    def close(self) -> None:
        self._tcp.shutdown()
        self._tcp.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    # -- connection phase

    def _serve_connection(self, sock: socket.socket) -> None:
        sock.settimeout(300)
        with self._lock:
            conn_id = self._next_conn_id
            self._next_conn_id += 1
        try:
            client_caps = self._handshake(sock, conn_id)
            if client_caps is None:
                return
            self._command_loop(sock, client_caps)
        except (OSError, ValueError, IndexError, struct.error):
            pass  # client went away / malformed frame: drop the conn
        finally:
            try:
                sock.close()
            except OSError:
                pass

    def _handshake(self, sock, conn_id: int) -> int | None:
        salt = os.urandom(20).replace(b"\x00", b"\x01")
        greeting = (
            b"\x0a" + self.server_version.encode() + b"\x00"
            + struct.pack("<I", conn_id) + salt[:8] + b"\x00"
            + struct.pack("<H", p.SERVER_CAPABILITIES & 0xFFFF)
            + bytes([p.CHARSET_UTF8MB4])
            + struct.pack("<H", p.SERVER_STATUS_AUTOCOMMIT)
            + struct.pack("<H", p.SERVER_CAPABILITIES >> 16)
            + bytes([21]) + b"\x00" * 10 + salt[8:20] + b"\x00"
            + b"mysql_native_password\x00")
        seq = p.write_packet(sock, greeting, 0)
        resp = p.read_packet(sock)
        if resp is None or len(resp) < 32:
            return None
        caps = struct.unpack_from("<I", resp, 0)[0]
        # username starts after caps(4) + max-packet(4) + charset(1) +
        # 23 reserved bytes; auth is accepted for any credentials (the
        # reference delegates to a pluggable authenticator — the default
        # test server accepts all; server/server_config.go)
        pos = 32
        end = resp.index(b"\x00", pos)
        self._last_user = resp[pos:end].decode("utf-8", "replace")
        pos = end + 1
        if caps & p.CLIENT_PLUGIN_AUTH_LENENC:
            _auth, pos = p.read_lenenc_bytes(resp, pos)
        elif caps & p.CLIENT_SECURE_CONNECTION:
            n = resp[pos]
            pos += 1 + n
        else:
            pos = resp.index(b"\x00", pos) + 1
        if caps & p.CLIENT_CONNECT_WITH_DB and pos < len(resp):
            end = resp.index(b"\x00", pos)
            db = resp[pos:end].decode("utf-8", "replace")
            if db:
                try:
                    with self._lock:
                        self.engine.query(f"USE `{db}`")
                except SqlError:
                    p.write_packet(sock, p.err_packet(
                        1049, "42000", f"Unknown database '{db}'"), seq)
                    return None
        p.write_packet(sock, p.ok_packet(), seq)
        return caps

    # -- command phase

    def _command_loop(self, sock, caps: int) -> None:
        while True:
            pkt = p.read_packet(sock)
            if pkt is None or not pkt:
                return
            cmd, body = pkt[0], pkt[1:]
            if cmd == p.COM_QUIT:
                return
            if cmd == p.COM_PING:
                p.write_packet(sock, p.ok_packet(), 1)
            elif cmd == p.COM_INIT_DB:
                self._run_and_reply(
                    sock, "USE `%s`" % body.decode("utf-8", "replace"))
            elif cmd == p.COM_QUERY:
                self._run_and_reply(sock, body.decode("utf-8", "replace"))
            elif cmd == p.COM_STATISTICS:
                p.write_packet(sock, b"Uptime: 0  Threads: 1", 1)
            elif cmd == p.COM_RESET_CONNECTION:
                p.write_packet(sock, p.ok_packet(), 1)
            elif cmd == p.COM_FIELD_LIST:
                # deprecated in MySQL 8; empty terminator is sufficient
                p.write_packet(sock, p.eof_packet(), 1)
            else:
                p.write_packet(sock, p.err_packet(
                    1047, "08S01", f"Unknown command {cmd:#x}"), 1)

    def _run_and_reply(self, sock, sql: str) -> None:
        try:
            with self._lock:
                res = self.engine.query(sql)
                if isinstance(res, OkResult):
                    rows, schema = None, None
                else:
                    schema = res.schema
                    rows = res.collect()
        except SqlError as exc:
            p.write_packet(sock, p.err_packet(
                exc.errno, exc.sqlstate, str(exc)), 1)
            return
        except Exception as exc:  # noqa: BLE001 — engine-internal error
            p.write_packet(sock, p.err_packet(
                1105, "HY000", str(exc)[:500]), 1)
            return
        if rows is None:
            p.write_packet(sock, p.ok_packet(
                res.rows_affected, res.last_insert_id or 0,
                info=res.info), 1)
            return
        seq = p.write_packet(sock, p.lenenc_int(len(schema.fields)), 1)
        for f in schema.fields:
            seq = p.write_packet(sock, p.column_definition(
                f.name, f.dataType, f.nullable), seq)
        seq = p.write_packet(sock, p.eof_packet(), seq)
        for r in rows:
            seq = p.write_packet(sock, p.text_row(tuple(r)), seq)
        p.write_packet(sock, p.eof_packet(), seq)
