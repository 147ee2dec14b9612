"""Session-scoped memo keys for build-once/probe-many index builders.

The persisted-index entries (x63's bucketed ANN table, x70/t13's
simhash index, x99/t15's PQ index, x100's appended PQ index) memoize
"already built this session" per (session, corpus). Keying that memo
by ``id(spark)`` is a foot-gun: CPython recycles ids after GC, so a
brand-new session can alias a stale entry from a stopped one
(round-6 verdict). The JVM session UUID is stable for the session's
lifetime and never reused, so it is the correct key.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def session_uid(spark: SparkSession) -> str:
    """A memo key that is unique per live SparkSession and never
    aliases across sessions (unlike ``id(spark)``). The uid is cached
    ON the session object, so even the fallback path (Spark Connect /
    API drift, where the JVM sessionUUID is unreachable) mints a fresh
    uuid4 per session OBJECT — a recycled id() can never alias,
    sequential or concurrent."""
    uid = getattr(spark, "_wren_session_uid", None)
    if uid is None:
        try:
            uid = str(spark._jsparkSession.sessionUUID())
        except Exception:
            import uuid

            uid = f"py-{uuid.uuid4()}"
        try:
            spark._wren_session_uid = uid
        except Exception:
            pass  # frozen/slotted session object: fall through uncached
    return uid
