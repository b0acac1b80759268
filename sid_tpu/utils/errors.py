"""Parse-error channel.

The reference throws ``std::invalid_argument("Malformed pileup line")`` and
terminates on the first bad line (pileup.cpp:22,28,34,40 — never caught). The
framework keeps that as *strict* mode, and adds what the reference lacks
(SURVEY §5.3): a per-shard error channel carrying site coordinates so long
multi-host runs can skip and report malformed lines instead of dying.
"""

from __future__ import annotations

import dataclasses
from typing import List

MALFORMED = "Malformed pileup line"
MALFORMED_OR_MISSING = "Malformed pileup line or missing mapping qualities"


class SidParseError(ValueError):
    """Raised in strict mode on a malformed pileup line."""

    def __init__(self, message: str, line_number: int = -1):
        super().__init__(message)
        self.line_number = line_number


@dataclasses.dataclass
class ParseErrorRecord:
    line_number: int  # 1-based line number within the parsed stream/shard
    message: str
    snippet: str = ""


@dataclasses.dataclass
class ErrorChannel:
    strict: bool = True
    records: List[ParseErrorRecord] = dataclasses.field(default_factory=list)

    def report(self, line_number: int, message: str, snippet: str = "") -> None:
        if self.strict:
            raise SidParseError(message, line_number)
        self.records.append(ParseErrorRecord(line_number, message, snippet[:80]))
