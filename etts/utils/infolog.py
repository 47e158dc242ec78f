"""Run-event logging for training drivers: stdout + append-to-file, plus an
optional fire-and-forget webhook for milestone alerts.

Role parity with the reference's run logger (`gst_tacotron/train.py:33`
uses it for step lines and crash alerts), re-designed for this repo: one
``RunLog`` object instead of free module globals, ISO-8601 timestamps, and a
generic JSON webhook payload that works with any Slack-compatible endpoint.
Alerts post from a daemon thread and swallow every error — logging must
never take down a training run (offline hosts simply log locally).
"""
from __future__ import annotations

import atexit
import json
from datetime import datetime, timezone
from threading import Thread
from typing import IO, Optional
from urllib.request import Request, urlopen


class RunLog:
    """Append run events to a logfile and optionally alert a webhook."""

    def __init__(self, path: str, run_name: str,
                 webhook_url: Optional[str] = None):
        self.run_name = run_name
        self.webhook_url = webhook_url
        self._fh: Optional[IO[str]] = open(path, "a")
        self._fh.write(f"=== run {run_name} opened "
                       f"{self._now()} ===\n")

    @staticmethod
    def _now() -> str:
        return datetime.now(timezone.utc).isoformat(timespec="milliseconds")

    def log(self, msg: str, alert: bool = False) -> None:
        print(msg)
        if self._fh is not None:
            self._fh.write(f"{self._now()} {msg}\n")
        if alert and self.webhook_url:
            Thread(target=self._post, args=(msg,), daemon=True).start()

    def _post(self, msg: str) -> None:
        try:
            req = Request(self.webhook_url,
                          headers={"Content-Type": "application/json"})
            urlopen(req, json.dumps(
                {"text": f"[{self.run_name}] {msg}"}).encode(), timeout=5)
        except Exception:  # noqa: BLE001 — alerts must never kill training
            pass

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


_active: Optional[RunLog] = None


def init(filename: str, run_name: str, slack_url: Optional[str] = None):
    """Open (or replace) the process-wide run log."""
    global _active
    close()
    _active = RunLog(filename, run_name, webhook_url=slack_url)
    return _active


def log(msg: str, slack: bool = False) -> None:
    """Log through the process-wide run log; plain print() before init."""
    if _active is not None:
        _active.log(msg, alert=slack)
    else:
        print(msg)


def close() -> None:
    global _active
    if _active is not None:
        _active.close()
        _active = None


atexit.register(close)
