"""Error taxonomy. Parity with reference src/error.rs:5-30."""

from __future__ import annotations


class ETLError(Exception):
    """Base for all engine errors."""


class RpcError(ETLError):
    pass


class DatabaseError(ETLError):
    pass


class ParseError(ETLError):
    pass


class ConfigError(ETLError):
    pass


class IOError_(ETLError):
    pass


class JsonError(ETLError):
    pass


class HttpError(ETLError):
    pass


class GenericError(ETLError):
    pass
