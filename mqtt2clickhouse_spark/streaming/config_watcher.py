"""Topic-configuration hot-reload (SURVEY.md §2.1 L2).

The reference long-polls Consul KV ``mqttClient/topics`` (a JSON
map name→topic-filter) and, on change, unsubscribes/resubscribes
(/root/reference/main.go:97-108, config/config.go:72-96).  Structured
Streaming sources cannot mutate subscriptions mid-query, so the engine's
equivalent is: watch the config source on a driver thread and, on
change, stop the streaming query and start a new one with the new
``topics`` option — the watcher calls back with the new map and the
caller owns the restart.

Two sources:
- ``FileTopicSource``: a JSON file (mtime-polled) — the default,
  dependency-free stand-in with identical semantics.
- ``ConsulTopicSource``: real Consul blocking queries over plain HTTP
  (stdlib urllib; the Consul KV API is just GET with ``index=`` for
  long-poll — no client library needed).  ``ModifyIndex`` drives change
  detection exactly like config/config.go:90-93.
"""

from __future__ import annotations

import base64
import json
import os
import threading
import urllib.parse
import urllib.request
from collections.abc import Callable


class FileTopicSource:
    """Topic map from a JSON file; ``poll`` blocks until change or timeout."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._last_mtime: float | None = None

    def load(self) -> dict[str, str]:
        # record the mtime so a subsequent poll() doesn't report the
        # just-loaded state as a change (the daemon loads once up front;
        # without this the watcher restarted the query immediately).
        # The mtime is captured BEFORE the read and recorded only after
        # a successful parse: a mid-write read then leaves the state
        # unchanged (poll retries), and a write that lands between stat
        # and read can at worst make poll() re-report an already-seen
        # map — which TopicWatcher suppresses against its APPLIED state
        # — never miss one.
        mtime = os.stat(self.path).st_mtime_ns
        with open(self.path) as f:
            topics = json.load(f)
        self._last_mtime = mtime
        return topics

    def poll(self, timeout: float = 5.0, interval: float = 0.1) -> dict[str, str] | None:
        """Return the topic map if the file's mtime changed within
        timeout, else None.  A change whose content does not (yet)
        parse — the writer is mid-write; plain ``write_text`` truncates
        before it writes — is retried on the next tick instead of being
        reported or crashing the caller.

        mtime change may over-report (a non-atomic writer touches the
        mtime twice; a rewrite with identical content still reports);
        deduplication against the APPLIED map lives in TopicWatcher,
        which alone knows whether the previous report was successfully
        acted on.  Suppressing here (by remembering the last-loaded
        content) looked equivalent but was not: a baseline committed at
        load time outlives a FAILED restart callback, so an operator
        rewriting the same desired map to re-trigger was silently
        ignored and the documented 'next change retries' path was
        dead."""
        import time

        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            try:
                mtime = os.stat(self.path).st_mtime_ns
            except FileNotFoundError:
                mtime = None
            if mtime != self._last_mtime:
                if mtime is None:
                    self._last_mtime = None
                else:
                    try:
                        return self.load()
                    except (ValueError, OSError):
                        pass  # mid-write / vanished: retry next tick
            time.sleep(interval)
        return None


class ConsulTopicSource:  # pragma: no cover - needs a Consul server
    """Consul KV blocking query (config/config.go:72-96 semantics)."""

    def __init__(self, address: str = "http://127.0.0.1:8500", key: str = "mqttClient/topics"):
        self.address = address.rstrip("/")
        self.key = key
        self.last_index = 0

    def poll(self, timeout: float = 300.0, **_) -> dict[str, str] | None:
        url = (
            f"{self.address}/v1/kv/{urllib.parse.quote(self.key)}"
            f"?index={self.last_index}&wait={int(timeout)}s"
        )
        with urllib.request.urlopen(url, timeout=timeout + 30) as resp:
            data = json.load(resp)
        entry = data[0]
        if entry["ModifyIndex"] == self.last_index:  # no change (go:90-93)
            return None
        self.last_index = entry["ModifyIndex"]
        return json.loads(base64.b64decode(entry["Value"]))


class TopicWatcher:
    """Driver-side watcher thread: on each topic-map change, invoke
    ``on_change(new_topics)`` (the caller stops/restarts its streaming
    query — sources can't re-subscribe live).

    Duplicate reports are suppressed HERE, against the last map whose
    restart callback SUCCEEDED — the watcher-level twin of the Consul
    source's ModifyIndex suppression (config/config.go:90-93).  The
    placement matters twice over:

    - A non-atomic config write touches the file mtime twice (truncate,
      then data), so the file source can report the same map twice; a
      duplicate restart tears down the freshly subscribed reader and
      loses any message delivered in between (the hot-reload
      end-to-end flake, reproduced 3/40 runs before suppression).
    - Suppressing inside the SOURCE (remembering the last-loaded
      content) commits the baseline before the change is acted on: a
      failed restart callback then made an operator's same-content
      rewrite permanently invisible, killing the documented
      'next change retries' path.  Keying on the APPLIED map retries
      duplicates for free after a failure and suppresses them after
      success.

    ``applied`` seeds the baseline with the map the caller already
    started its query with (the daemon loads once up front).

    ``retry_backoff`` paces the retry after a FAILED poll: the file
    source fails slowly (its poll sleeps between mtime ticks), but the
    Consul source against a DOWN agent raises in microseconds
    (connection refused) — an unpaced retry loop then spins the driver
    thread at 100% CPU for as long as the outage lasts (r15 review
    sweep).  The wait is stop-aware, so ``stop()`` is never delayed by
    a pending backoff."""

    def __init__(
        self,
        source,
        on_change: Callable[[dict[str, str]], None],
        poll_timeout: float = 1.0,
        applied: dict[str, str] | None = None,
        retry_backoff: float = 1.0,
    ):
        self.source = source
        self.on_change = on_change
        self.poll_timeout = poll_timeout
        self.retry_backoff = retry_backoff
        self._applied = applied
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.is_set():
            # a transient source failure (config file mid-write, Consul
            # connection blip) must not kill the watch thread — the
            # reference's Consul loop likewise retries its blocking
            # query forever (config/config.go:72-96).  Swallow, retry.
            try:
                topics = self.source.poll(timeout=self.poll_timeout)
            except Exception:
                # pace the retry: a source that fails INSTANTLY (Consul
                # agent down → connection refused in microseconds) would
                # otherwise hot-spin this thread for the whole outage
                self._stop.wait(self.retry_backoff)
                continue
            if topics is not None and topics != self._applied:
                try:
                    self.on_change(topics)
                except Exception:
                    # A failed restart callback may have ALREADY stopped
                    # the old query (the daemon's restart is stop-then-
                    # start), so no map is safely "applied" any more —
                    # invalidate the baseline so ANY subsequent report
                    # retries, including a revert to the previously
                    # applied map (which would otherwise compare equal
                    # and be suppressed while no query runs).  Worst
                    # case: one redundant restart after a failure.
                    self._applied = None
                    continue
                self._applied = topics

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
