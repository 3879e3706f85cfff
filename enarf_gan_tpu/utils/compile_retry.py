"""Retry wrapper for the flaky remote TPU compile service.

GAN-step-scale graphs are intermittently rejected by the remote compile
helper with ``HTTP 500: tpu_compile_helper subprocess exit code 1`` — the
same graph then compiles on a later attempt (round 4 reproduced a config
that compiled in round 1 failing this way; PERF.md "Training and production
shapes"). The failure happens at the *first call* of a jitted function, and
a failed attempt is not cached, so simply calling again retries the
compile.

``call_with_compile_retry(fn, *args)`` runs ``fn`` and retries with
exponential backoff when the error signature matches a transient
compile-service failure. Anything else (ResourceExhausted, real lowering
errors) re-raises immediately — retrying cannot fix those.
"""
from __future__ import annotations

import time
from typing import Any, Callable

TRANSIENT_MARKERS = (
    "tpu_compile_helper",
    "remote_compile: HTTP 5",
    "DEADLINE_EXCEEDED",
    "UNAVAILABLE",
)
PERMANENT_MARKERS = (
    "RESOURCE_EXHAUSTED",
    "ResourceExhausted",
)


def is_transient_compile_error(e: BaseException) -> bool:
    s = str(e)
    if any(m in s for m in PERMANENT_MARKERS):
        return False
    return any(m in s for m in TRANSIENT_MARKERS)


def call_with_compile_retry(fn: Callable[..., Any], *args,
                            retries: int = 4, backoff: float = 15.0,
                            verbose: bool = True, **kwargs) -> Any:
    """Call ``fn(*args, **kwargs)``, retrying transient compile failures.

    Backoff doubles each attempt (15 s, 30 s, 60 s, ...) — the service
    failures are load/transient, and immediate retries tend to hit the
    same broken helper subprocess.
    """
    delay = backoff
    for attempt in range(retries + 1):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 - filtered below
            if attempt >= retries or not is_transient_compile_error(e):
                raise
            if verbose:
                print(f"[compile-retry] transient compile-service failure "
                      f"(attempt {attempt + 1}/{retries + 1}); retrying in "
                      f"{delay:.0f}s: {str(e)[:160]}", flush=True)
            time.sleep(delay)
            delay *= 2


def retrying_first_call(fn: Callable[..., Any], **retry_kw) -> Callable[..., Any]:
    """Wrap a jitted callable so its FIRST invocation (the compile) retries
    transient compile-service failures; later calls go straight through.

    Used by the train loops: training on chip must not die because the
    remote compile helper 500'd once (VERDICT r4 Weak #6).
    """
    state = {"first": True}

    def wrapped(*args, **kwargs):
        if state["first"]:
            state["first"] = False
            return call_with_compile_retry(fn, *args, **retry_kw, **kwargs)
        return fn(*args, **kwargs)

    return wrapped
