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
    aliases across sessions (unlike ``id(spark)``)."""
    try:
        return str(spark._jsparkSession.sessionUUID())
    except Exception:
        # Spark Connect / API drift: the app id never aliases across
        # JVM restarts (it embeds the start timestamp), and within one
        # JVM the object id disambiguates concurrent live sessions.
        app_id = ""
        try:
            app_id = spark.conf.get("spark.app.id", "") or ""
        except Exception:
            pass
        return f"{app_id}:{id(spark)}"
