"""Bounded exponential-backoff retry (SURVEY.md §2.7 C4).

Mirrors the reference's RetryOnBackoff
(/root/reference/drivers/base/utils.go:9-22): run up to ``attempts``
times, sleeping ``base_sleep_s`` doubled before each retry. Used to wrap
maintenance-job group execution against transient failures and the table
commit against CommitConflict (refresh-and-revalidate between attempts
happens inside the retried callable).
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from typing import TypeVar

log = logging.getLogger(__name__)
T = TypeVar("T")


def retry_on_backoff(
    fn: Callable[[], T],
    attempts: int = 3,
    base_sleep_s: float = 1.0,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleeper: Callable[[float], None] = time.sleep,
) -> T:
    """Return fn()'s result, retrying ``retry_on`` exceptions.

    The final failure is re-raised. ``sleeper`` is injectable for tests.
    """
    sleep = base_sleep_s
    err: BaseException | None = None
    for cur in range(attempts):
        if cur != 0:
            log.info(
                "retry attempt[%d], retrying after %.2f seconds due to: %s",
                cur,
                sleep,
                err,
            )
            sleeper(sleep)
            sleep *= 2
        try:
            return fn()
        except retry_on as e:
            err = e
    assert err is not None
    raise err
