"""Verbosity-gated logging, stdout-compatible with the reference.

The reference logs with printf macros INFO (verbosity>0), DEBUG (>1) and
TRACE (>2) (reference src/private.h:29-33), and its test suite parses the
stdout lines — in particular ``iteration %d: %u reassignments``
(kmeans.cu:706, parsed by test.py:186-187).  We keep the same contract:
plain lines on stdout, gated by an integer verbosity.
"""

import sys


class Logger:
    def __init__(self, verbosity: int = 0):
        self.verbosity = int(verbosity)

    def info(self, msg: str) -> None:
        if self.verbosity > 0:
            print(msg, flush=True)

    def debug(self, msg: str) -> None:
        if self.verbosity > 1:
            print(msg, flush=True)

    def trace(self, msg: str) -> None:
        if self.verbosity > 2:
            print(msg, flush=True)

    def iteration(self, n: int, reassignments: int) -> None:
        """The machine-readable progress line; format is part of the API
        surface (tests assert on it, like the reference's test.py:186-187)."""
        if self.verbosity > 0:
            print("iteration %d: %d reassignments" % (n, reassignments),
                  flush=True)

    def warning(self, msg: str) -> None:
        print(msg, file=sys.stderr, flush=True)
