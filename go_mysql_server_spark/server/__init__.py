"""Wire-protocol server front (reference server/server.go) and a
minimal test/demo client."""

from .client import Client, MySQLClientError, OkStatus, ResultSet
from .server import MySQLServer

__all__ = ["MySQLServer", "Client", "MySQLClientError", "OkStatus",
           "ResultSet"]
