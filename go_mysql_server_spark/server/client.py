"""Minimal pure-Python MySQL text-protocol client.

Exists so the wire server can be exercised end-to-end without external
client libraries (the reference tests its server through go-sql-driver;
enginetest/server_test.go) — and doubles as a tiny programmatic client
for anyone embedding the server. Speaks handshake-v10 + COM_QUERY with
the classic EOF-terminated text resultset this server emits.
"""

from __future__ import annotations

import socket
import struct

from . import protocol as p


class MySQLClientError(Exception):
    def __init__(self, errno: int, sqlstate: str, msg: str):
        super().__init__(f"({errno}, {sqlstate}): {msg}")
        self.errno, self.sqlstate = errno, sqlstate


class ResultSet:
    def __init__(self, columns: list[str], rows: list[tuple]):
        self.columns = columns
        self.rows = rows


class OkStatus:
    def __init__(self, affected: int, last_insert_id: int, info: str):
        self.affected = affected
        self.last_insert_id = last_insert_id
        self.info = info


class Client:
    CAPS = (p.CLIENT_PROTOCOL_41 | p.CLIENT_SECURE_CONNECTION
            | p.CLIENT_PLUGIN_AUTH | p.CLIENT_CONNECT_WITH_DB)

    def __init__(self, host: str, port: int, user: str = "root",
                 database: str = "", timeout: float = 30.0):
        self.sock = socket.create_connection((host, port), timeout)
        greeting = p.read_packet(self.sock)
        if greeting is None or greeting[0] != 0x0A:
            raise MySQLClientError(2013, "HY000", "bad greeting")
        self.server_version = greeting[1:greeting.index(b"\x00", 1)].decode()
        caps = self.CAPS if database else (
            self.CAPS & ~p.CLIENT_CONNECT_WITH_DB)
        resp = (struct.pack("<IIB", caps, 1 << 24, p.CHARSET_UTF8MB4)
                + b"\x00" * 23 + user.encode() + b"\x00"
                + b"\x00")  # empty auth response (1-byte length 0)
        if database:
            resp += database.encode() + b"\x00"
        resp += b"mysql_native_password\x00"
        p.write_packet(self.sock, resp, 1)
        self._expect_ok(p.read_packet(self.sock))

    def _expect_ok(self, pkt: bytes | None) -> OkStatus:
        if pkt is None:
            raise MySQLClientError(2013, "HY000", "connection closed")
        if pkt[0] == 0xFF:
            errno = struct.unpack_from("<H", pkt, 1)[0]
            raise MySQLClientError(
                errno, pkt[4:9].decode("ascii", "replace"),
                pkt[9:].decode("utf-8", "replace"))
        if pkt[0] != 0x00 and pkt[0] != 0xFE:
            raise MySQLClientError(2027, "HY000", f"bad packet {pkt[:1]!r}")
        affected, pos = p.read_lenenc_int(pkt, 1)
        last_id, pos = p.read_lenenc_int(pkt, pos)
        info = pkt[pos + 4:].decode("utf-8", "replace")
        return OkStatus(affected, last_id, info)

    def query(self, sql: str) -> ResultSet | OkStatus:
        p.write_packet(self.sock, bytes([p.COM_QUERY]) + sql.encode(), 0)
        first = p.read_packet(self.sock)
        if first is None:
            raise MySQLClientError(2013, "HY000", "connection closed")
        if first[0] in (0x00, 0xFF):
            return self._expect_ok(first)
        ncols, _ = p.read_lenenc_int(first, 0)
        columns = []
        for _ in range(ncols):
            cd = p.read_packet(self.sock)
            pos = 0
            vals = []
            for _f in range(6):  # catalog schema table org_table name org
                v, pos = p.read_lenenc_bytes(cd, pos)
                vals.append(v)
            columns.append(vals[4].decode("utf-8", "replace"))
        self._read_eof()
        rows: list[tuple] = []
        while True:
            pkt = p.read_packet(self.sock)
            if pkt is None:
                raise MySQLClientError(2013, "HY000", "mid-resultset EOF")
            if pkt[0] == 0xFE and len(pkt) < 9:
                break
            if pkt[0] == 0xFF:
                self._expect_ok(pkt)
            cells, pos = [], 0
            while pos < len(pkt):
                if pkt[pos] == 0xFB:
                    cells.append(None)
                    pos += 1
                else:
                    v, pos = p.read_lenenc_bytes(pkt, pos)
                    cells.append(v.decode("utf-8", "replace"))
            rows.append(tuple(cells))
        return ResultSet(columns, rows)

    def _read_eof(self) -> None:
        pkt = p.read_packet(self.sock)
        if pkt is None or pkt[0] != 0xFE:
            raise MySQLClientError(2027, "HY000", "expected EOF")

    def ping(self) -> bool:
        p.write_packet(self.sock, bytes([p.COM_PING]), 0)
        self._expect_ok(p.read_packet(self.sock))
        return True

    def select_db(self, database: str) -> None:
        p.write_packet(
            self.sock, bytes([p.COM_INIT_DB]) + database.encode(), 0)
        self._expect_ok(p.read_packet(self.sock))

    def close(self) -> None:
        try:
            p.write_packet(self.sock, bytes([p.COM_QUIT]), 0)
        except OSError:
            pass
        self.sock.close()
