"""Engine self-instrumentation (reference K3, SURVEY.md §2A).

The reference's ops loop: its tickers log kayvee lines about
themselves (`max_log_delay` gauge, volume-ship stats), those lines
flow back through the very pipeline they instrument, and
kvconfig.yml routes them to metrics (delay.go:35-39, kvconfig.yml:
1-28, loaded at main.go:40-49).

The engine's equivalent: :class:`EngineMetricsListener` is a
``StreamingQueryListener`` that renders each query-progress event as
a kayvee-formatted log line (syslog header + JSON body with
``title="stats"``). The captured lines are valid pipeline input —
``process_lines`` + ``rules.SELF_INSTRUMENTATION_RULES`` (the
kvconfig.yml analogue) route them into ``kv.…stats`` counter points,
closing the same loop. Timestamps come from the progress event
itself, so replays are deterministic.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming.listener import StreamingQueryListener


class EngineMetricsListener(StreamingQueryListener):
    """Collects one kayvee 'stats' line per streaming progress event.

    Lines accumulate in ``self.lines`` (thread-safe — listener
    callbacks fire on a JVM-driven thread). Feed them back through
    ``pipeline.process_lines`` with the self-instrumentation rules to
    obtain the engine's own metric datapoints.
    """

    def __init__(
        self,
        deploy_env: str = "production",
        hostname: str = "spark-engine",
        program: str = "production--kinesis-alerts-consumer-spark",
    ) -> None:
        self.deploy_env = deploy_env
        self.hostname = hostname
        self.program = program
        self.lines: list[str] = []
        self._lock = threading.Lock()

    # -- StreamingQueryListener interface --------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        # progress.timestamp: ISO-8601 UTC, e.g. 2026-08-13T08:00:00.123Z
        ts = p.timestamp.replace("Z", "").split(".")[0]
        body = {
            "title": "stats",
            "type": "counter",
            "value": p.numInputRows,
            "source": "streaming-query",
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "rows_per_sec": p.processedRowsPerSecond,
        }
        line = (
            f"{ts} {self.hostname} {self.program}[1]: "
            + json.dumps(body, sort_keys=True)
        )
        with self._lock:
            self.lines.append(line)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- accessors -------------------------------------------------------

    def snapshot(self) -> list[str]:
        with self._lock:
            return list(self.lines)
