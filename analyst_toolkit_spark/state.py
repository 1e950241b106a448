"""Session state — named-dataset registry (S6).

Reference semantics (mcp_server/state.py:19-20, 68-81, 213-327, 612-646):
dict of ``session_id → DataFrame`` + metadata, bounded to ``max_entries``
(default 32) with TTL (default 3600 s) and LRU eviction; optional durable
backend (reference uses sqlite pickles — here: parquet, the only sane
serialization for distributed data).

Spark mapping: a saved session is a cached DataFrame + temp view named
``session_<id>`` so the SQL surface can query it. Durable sessions checkpoint
to versioned parquet dirs ``persist_dir/<id>.v-<hex>.parquet`` behind an
atomically-swapped pointer file ``<id>.current`` (legacy ``<id>.parquet``
still restores) and survive a new SparkSession.
"""

from __future__ import annotations

import os
import re
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_ID_RE = re.compile(r"^[A-Za-z0-9_\-]{1,128}$")


@dataclass
class SessionEntry:
    df: DataFrame
    metadata: dict = field(default_factory=dict)
    configs: dict = field(default_factory=dict)  # module -> yaml str (infer_configs persistence)
    created_at: float = 0.0
    last_used: float = 0.0


class SessionStore:
    def __init__(
        self,
        spark: SparkSession,
        max_entries: int = 32,
        ttl_sec: float = 3600.0,
        persist_dir: str | None = None,
        cache: bool = True,
    ) -> None:
        self.spark = spark
        self.max_entries = max_entries
        self.ttl_sec = ttl_sec
        self.persist_dir = persist_dir
        self.cache = cache
        self._entries: dict[str, SessionEntry] = {}
        # One re-entrant lock for registry + persist mutations: the MCP HTTP
        # transport is a ThreadingHTTPServer, so two tool calls can save the
        # same session concurrently; unserialized rmtree/rename interleavings
        # lose writes or crash mid-swap.
        self._lock = threading.RLock()

    @staticmethod
    def _check_id(session_id: str) -> str:
        if not _ID_RE.match(session_id or ""):
            raise ValueError(f"invalid session id {session_id!r}")
        return session_id

    def _view(self, session_id: str) -> str:
        return f"session_{session_id}"

    def _register(self, session_id: str, df: DataFrame, metadata: dict | None = None) -> DataFrame:
        with self._lock:
            self._evict()
            now = time.time()
            old = self._entries.pop(session_id, None)
            if old is not None and self.cache:
                old.df.unpersist()
            if self.cache:
                df = df.cache()
            df.createOrReplaceTempView(self._view(session_id))
            entry = SessionEntry(df=df, metadata=metadata or {}, created_at=now, last_used=now)
            if old is not None:
                entry.configs = old.configs
            self._entries[session_id] = entry
            return df

    # -- persistence layout ---------------------------------------------------
    # Versioned directories + atomic pointer swap (never delete the live read
    # path): each save writes `<id>.v-<hex>.parquet` and then os.replace()s the
    # small pointer file `<id>.current` onto it. Readers resolve the pointer at
    # restore time, so a Spark job mid-scan of the previous version keeps its
    # directory — only versions at least two saves old are garbage-collected.

    def _pointer_path(self, session_id: str) -> str:
        return os.path.join(self.persist_dir, f"{session_id}.current")

    def _resolve_persisted(self, session_id: str) -> str | None:
        """Current persisted data path for a session, or None."""
        ptr = self._pointer_path(session_id)
        try:
            with open(ptr, encoding="utf-8") as fh:
                version = fh.read().strip()
            path = os.path.join(self.persist_dir, version)
            if os.path.exists(path):
                return path
        except FileNotFoundError:
            pass
        legacy = os.path.join(self.persist_dir, f"{session_id}.parquet")
        return legacy if os.path.exists(legacy) else None

    def _gc_versions(self, session_id: str, keep: set[str]) -> None:
        import shutil

        prefix = f"{session_id}.v-"
        for name in os.listdir(self.persist_dir):
            if name.startswith(prefix) and name not in keep:
                shutil.rmtree(os.path.join(self.persist_dir, name), ignore_errors=True)

    def save(self, session_id: str, df: DataFrame, metadata: dict | None = None) -> None:
        session_id = self._check_id(session_id)
        if self.persist_dir:
            with self._lock:
                prior = self._resolve_persisted(session_id)
                version = f"{session_id}.v-{uuid.uuid4().hex[:8]}.parquet"
                target = os.path.join(self.persist_dir, version)
                df.write.mode("overwrite").parquet(target)
                ptr = self._pointer_path(session_id)
                tmp_ptr = f"{ptr}.tmp-{uuid.uuid4().hex[:8]}"
                with open(tmp_ptr, "w", encoding="utf-8") as fh:
                    fh.write(version)
                os.replace(tmp_ptr, ptr)  # atomic pointer swap
                keep = {version}
                if prior is not None:
                    keep.add(os.path.basename(prior))  # in-flight scans survive
                self._gc_versions(session_id, keep)
                # register a fresh read of the new version — truncated lineage,
                # no DataFrame left referencing a GC-able directory
                df = self.spark.read.parquet(target)
        self._register(session_id, df, metadata)

    def get(self, session_id: str) -> DataFrame:
        session_id = self._check_id(session_id)
        with self._lock:
            entry = self._entries.get(session_id)
            if entry is None:
                if self.persist_dir:
                    path = self._resolve_persisted(session_id)
                    if path is not None:
                        # restore WITHOUT re-persisting: writing over the parquet
                        # we are lazily reading from would corrupt the restore
                        return self._register(session_id, self.spark.read.parquet(path))
                raise KeyError(f"no session {session_id!r}")
            if self.ttl_sec and time.time() - entry.last_used > self.ttl_sec:
                self.delete(session_id)
                raise KeyError(f"session {session_id!r} expired")
            entry.last_used = time.time()
            return entry.df

    def save_config(self, session_id: str, module: str, config_yaml: str) -> None:
        """Persist an inferred module config on the session
        (reference state.py:414-441)."""
        with self._lock:
            self._entries[self._check_id(session_id)].configs[module] = config_yaml

    def get_config(self, session_id: str, module: str) -> str | None:
        entry = self._entries.get(self._check_id(session_id))
        return entry.configs.get(module) if entry else None

    def delete(self, session_id: str) -> None:
        with self._lock:
            entry = self._entries.pop(session_id, None)
            if entry is not None:
                if self.cache:
                    entry.df.unpersist()
                self.spark.catalog.dropTempView(self._view(session_id))

    def list_sessions(self) -> list[dict[str, Any]]:
        return [
            {
                "session_id": sid,
                "created_at": e.created_at,
                "last_used": e.last_used,
                "metadata": e.metadata,
            }
            for sid, e in self._entries.items()
        ]

    def _evict(self) -> None:
        """TTL expiry then LRU down to max_entries-1 (room for the new save)."""
        now = time.time()
        if self.ttl_sec:
            for sid in [s for s, e in self._entries.items() if now - e.last_used > self.ttl_sec]:
                self.delete(sid)
        while len(self._entries) >= self.max_entries:
            lru = min(self._entries, key=lambda s: self._entries[s].last_used)
            self.delete(lru)
