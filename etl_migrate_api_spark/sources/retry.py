"""Transient-failure retry for the HTTP sources.

The reference ships a reconnect policy on its upstream client
(redisClient.js:7-15: up to 10 retries with ``min(retries*100, 3000)``
ms linear-capped backoff); the Spark sources mirror that policy so one
transient 503 / connection reset doesn't kill an executor partition —
and with it the whole stage — mid-read.

Scope: ONLY transient failures are retried (connection errors,
timeouts, HTTP 5xx). A 4xx is a caller bug and re-raises immediately.
A malformed JSON body also re-raises: silently re-fetching could mask
an upstream contract break. After ``max_retries`` the last error
propagates and Spark's own task retry takes over — safe, because keyset
page reads are pure (the re-run re-reads the same id range).
"""

from __future__ import annotations

import json
import time
from typing import Any, Callable
from urllib.error import HTTPError, URLError

MAX_RETRIES = 10


def backoff_seconds(attempt: int) -> float:
    """Linear-capped backoff: 0.1 s, 0.2 s, … capped at 3 s — the
    reference's ``min(retries*100, 3000)`` ms policy."""
    return min(attempt * 0.1, 3.0)


def get_json(
    url: str,
    timeout: float = 30.0,
    max_retries: int = MAX_RETRIES,
    sleep: Callable[[float], None] = time.sleep,
) -> dict[str, Any]:
    """GET ``url`` and parse the JSON body, with transient-failure
    retry. ``sleep`` is injectable so tests assert the backoff schedule
    without waiting it out."""
    from urllib.request import urlopen

    attempt = 0
    while True:
        try:
            with urlopen(url, timeout=timeout) as resp:  # noqa: S310 (caller-controlled URL)
                return json.loads(resp.read().decode("utf-8"))
        except HTTPError as ex:
            # HTTPError precedes URLError in the except chain: it IS a
            # URLError subclass, and only 5xx is worth retrying
            if ex.code < 500 or attempt >= max_retries:
                raise
        except (TimeoutError, URLError, OSError):
            if attempt >= max_retries:
                raise
        attempt += 1
        sleep(backoff_seconds(attempt))
