"""Bounded reconnect-with-jitter for the remote scan clients.

The reference rides clickhouse-rs's pooled client
(/root/reference/src/clickhouse_scan.rs:76-77), which retries
transient connect failures internally. At 100 TB fan-out a Spark job
opens thousands of connections; without retry any single transient
reset fails the task (Spark re-runs it — correctness holds — but a
whole-task re-read of a multi-GB partition to recover from one SYN
drop is wasteful).

Policy: full-jitter exponential backoff (delay ~ U(0, base * 2^i),
capped), retrying only TRANSPORT errors (OSError covers socket/ssl/
urllib connect+read failures; EOFError covers a mid-handshake or
mid-header hangup). Server-reported exceptions and protocol errors
are NOT retryable — re-running a query the server rejected wastes a
round trip and can mask real bugs.

Replay soundness: a failure that occurs AFTER result rows reached the
consumer must NOT be retried here — re-running the partition query
appends a full fresh result after a partial one (ClickHouse gives no
deterministic block order without ORDER BY, so "skip what was seen"
is unsound). The reader therefore retries only until the first block
is yielded; later failures propagate to Spark's task retry, which
re-runs the whole partition exactly once-per-attempt.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass
from typing import Iterator

# OSError covers ConnectionError, socket.timeout (TimeoutError),
# ssl.SSLError and urllib.error.URLError; EOFError is the codec's
# truncated-stream signal during handshake/header reads
RETRYABLE_EXC = (OSError, EOFError)


@dataclass
class RetryPolicy:
    attempts: int = 3
    base_delay: float = 0.2
    max_delay: float = 5.0

    @classmethod
    def from_options(cls, options: dict) -> "RetryPolicy":
        return cls(
            attempts=max(1, int(options.get("retry_attempts", 3))),
            base_delay=float(options.get("retry_base_delay", 0.2)),
            max_delay=float(options.get("retry_max_delay", 5.0)),
        )

    def backoffs(self) -> Iterator[float | None]:
        """Yield ``attempts`` values: the sleep to take AFTER each
        failed attempt, ``None`` after the last (caller re-raises)."""
        for i in range(self.attempts):
            if i == self.attempts - 1:
                yield None
            else:
                yield random.uniform(
                    0, min(self.max_delay, self.base_delay * (2**i))
                )

    def sleep(self, delay: float) -> None:  # patchable in tests
        time.sleep(delay)
