"""Operator-level plan memoization.

A DataFrame is an immutable lazy plan; building one costs real driver time
(py4j round-trips per Column op — measured 1.0-1.5 s for the 64-perm MinHash
expression tree, guide §1/§7.3 "driver-side work"). Returning the SAME
DataFrame object for the same (input frame, params) removes that rebuild the
same way ``queries._t`` memoizes table reads and the engine's skeleton cache
memoizes compiled scripts. Execution is untouched: every action on the
memoized frame recomputes from the parquet inputs.

Keyed on ``id()`` of the input DataFrame(s) — safe because the memo holds a
strong reference (the id cannot be reused while the entry lives). Bounded
LRU so long-lived sessions (fuzz suites register thousands of frames) don't
accumulate plans.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from functools import wraps

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_MAXSIZE = 64


def _session_stopped(df: DataFrame) -> bool:
    """Python-side liveness check (SparkContext.stop() nulls _jsc) — no
    py4j round-trip, so it is cheap enough to sweep the whole cache."""
    try:
        sc = df.sparkSession._sc
        return sc is None or getattr(sc, "_jsc", None) is None
    except Exception:
        return False


def plan_memo(fn=None, *, extra_key=None):
    """Memoize a DataFrame-building operator on (input frames, params).

    Positional/keyword args that are DataFrames key on identity (and are
    pinned by the memo entry); everything else must be hashable.
    Non-hashable params or a stopped session fall through to a plain call.

    ``extra_key(*args, **kwargs) -> hashable`` injects call-time state the
    plan BAKES IN but the arguments don't carry — a tuning conf read at
    build time, or a rotating-cache generation — so changing that state
    invalidates the memo instead of silently serving a stale plan (r11
    review findings). The extra key is re-evaluated at STORE time too:
    when the operator's own body advances the state (e.g. rotating a
    cache slot unpersists the previous table), the entry is recorded
    under the post-call state and the next identical call hits.
    """
    if fn is None:
        return lambda f: plan_memo(f, extra_key=extra_key)

    cache: "OrderedDict[tuple, tuple]" = OrderedDict()

    def _make_key(args, kwargs, pinned):
        key_parts = []
        for a in args:
            if isinstance(a, DataFrame):
                key_parts.append(("df", id(a)))
                pinned.append(a)
            else:
                key_parts.append(("v", a))
        for k in sorted(kwargs):
            v = kwargs[k]
            if isinstance(v, DataFrame):
                key_parts.append((k, "df", id(v)))
                pinned.append(v)
            else:
                key_parts.append((k, "v", v))
        if extra_key is not None:
            key_parts.append(("x", extra_key(*args, **kwargs)))
        key = tuple(key_parts)
        hash(key)
        return key

    @wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            key = _make_key(args, kwargs, [])
        except TypeError:
            return fn(*args, **kwargs)
        except Exception:
            return fn(*args, **kwargs)
        with _LOCK:
            hit = cache.get(key)
            if hit is not None:
                out, pins = hit
                # a memoized plan from a stopped session must not be served
                if _session_stopped(out):
                    cache.pop(key, None)
                    hit = None
                if hit is not None:
                    cache.move_to_end(key)
                    return out
        out = fn(*args, **kwargs)
        if isinstance(out, DataFrame):
            try:
                pinned: list = []
                store_key = _make_key(args, kwargs, pinned)
            except Exception:
                return out
            with _LOCK:
                # sweep dead-session entries (they would otherwise pin py4j
                # refs until pushed out by LRU — r11 review finding)
                dead = [k for k, (o, _p) in cache.items() if _session_stopped(o)]
                for k in dead:
                    cache.pop(k, None)
                cache[store_key] = (out, tuple(pinned))
                while len(cache) > _MAXSIZE:
                    cache.popitem(last=False)
        return out

    wrapper.__wrapped__ = fn
    return wrapper
