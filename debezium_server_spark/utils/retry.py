"""Generic retry with exponential backoff.

Reference: RetryExecutor.executeWithRetry(Callable, Predicate, String) —
retryable-predicate, max retries, backoff multiplier
(debezium-server-core/src/main/java/io/debezium/server/util/
RetryExecutor.java:54-91). Driver-side plain Python: Spark task retries
(`spark.task.maxFailures`) cover compute; this covers sink I/O inside
foreachBatch/foreachPartition.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from dataclasses import dataclass
from typing import TypeVar

LOG = logging.getLogger(__name__)
R = TypeVar("R")


@dataclass
class RetryPolicy:
    max_retries: int = 5  # reference default (KinesisChangeConsumerConfig.java:19)
    initial_delay_s: float = 1.0  # reference retry interval 1s
    backoff_multiplier: float = 2.0
    max_delay_s: float = 30.0


def execute_with_retry(
    fn: Callable[[], R],
    retryable: Callable[[Exception], bool] = lambda _: True,
    description: str = "operation",
    policy: RetryPolicy | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> R:
    """Run `fn`, retrying retryable failures with exponential backoff."""
    policy = policy or RetryPolicy()
    delay = policy.initial_delay_s
    last: Exception | None = None
    for attempt in range(policy.max_retries + 1):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 - retry boundary
            last = exc
            if not retryable(exc) or attempt == policy.max_retries:
                raise
            LOG.warning("%s failed (attempt %d/%d): %s — retrying in %.1fs",
                        description, attempt + 1, policy.max_retries, exc, delay)
            sleep(delay)
            delay = min(delay * policy.backoff_multiplier, policy.max_delay_s)
    raise last  # pragma: no cover - unreachable
