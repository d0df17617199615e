"""Interactive control channel for a running sharded crawl (reference S7).

The reference crawler serves stdin commands from its event loop while
transfers run: qlen / dumpq / reschedule / status / quit
(crawler.cc:604-625 dispatch, crawler.cc:1375-1395 handlers). The rebuild
serves the same verbs from a daemon thread reading any line stream
(stdin for the CLI, an in-memory pipe in tests) and answering as JSON
lines. Queries fan out to the planner-shard actors' "control"
concurrency group, so they answer while a round is mid-crawl; ``quit``
requests a graceful stop, honored by the round loop at its next barrier
(one round is the rebuild's scheduling quantum — the analog of the
reference finishing in-flight transfers before exiting).

Commands:
  qlen               total + per-shard frontier depths
  status             full per-shard status dicts (counters, queue map)
  dumpq [limit]      frontier contents across shards (default 20 rows)
  reschedule         acknowledged no-op: the streaming executor and the
                     round loop schedule continuously (the reference's
                     manual kick has no idle state to kick here)
  quit               stop after the current round
  help               list commands
"""

from __future__ import annotations

import json
import threading

import ray


class ControlChannel:
    """Reads command lines from ``stream``, writes JSON-line replies to
    ``out``. ``stop`` is set when a ``quit`` arrives; the crawl's round
    loop polls it. The thread is a daemon and also exits when the stream
    ends or ``close()`` is called."""

    def __init__(self, shards: list, stream, out):
        self.shards = list(shards)
        self.stream = stream
        self.out = out
        self.stop = threading.Event()
        self.thread = threading.Thread(
            target=self._loop, name="crawl-control", daemon=True)
        self.thread.start()

    # -- lifecycle ---------------------------------------------------------
    # There is deliberately no close(): commands already submitted on the
    # stream are always drained and answered (dropping them mid-queue made
    # replies racy against crawl completion), and the serving thread is a
    # daemon — it ends at stream EOF, on ``quit``, or with the process.
    # Post-crawl queries against a cleared/parked pool answer idle=True.

    def join(self, timeout: float = 5.0) -> None:
        self.thread.join(timeout)

    # -- internals ---------------------------------------------------------
    def _reply(self, obj: dict) -> None:
        self.out.write(json.dumps(obj) + "\n")
        flush = getattr(self.out, "flush", None)
        if flush:
            flush()

    def _statuses(self) -> list[dict]:
        return ray.get([s.status.remote() for s in self.shards])

    def _loop(self) -> None:
        for line in self.stream:
            parts = line.strip().split()
            if not parts:
                continue
            cmd, args = parts[0], parts[1:]
            try:
                if cmd == "qlen":
                    st = self._statuses()
                    self._reply({
                        "qlen": sum(s.get("frontier_size", 0) for s in st),
                        "per_shard": {str(s["shard"]):
                                      s.get("frontier_size", 0)
                                      for s in st},
                    })
                elif cmd == "status":
                    self._reply({"status": self._statuses()})
                elif cmd == "dumpq":
                    limit = int(args[0]) if args else 20
                    per = max(1, limit // max(1, len(self.shards)))
                    rows = ray.get([s.dump_frontier.remote(per)
                                    for s in self.shards])
                    flat = [r for shard_rows in rows for r in shard_rows]
                    self._reply({"dumpq": flat[:limit],
                                 "truncated_to": limit})
                elif cmd == "reschedule":
                    self._reply({"reschedule":
                                 "noop: rounds schedule continuously"})
                elif cmd == "quit":
                    self.stop.set()
                    self._reply({"quit": "stopping after current round"})
                    break
                elif cmd == "help":
                    self._reply({"commands": ["qlen", "status",
                                              "dumpq [limit]", "reschedule",
                                              "quit", "help"]})
                else:
                    self._reply({"error": f"unknown command {cmd!r}",
                                 "hint": "help"})
            except Exception as e:  # never let a bad command kill the channel
                self._reply({"error": str(e), "cmd": cmd})
