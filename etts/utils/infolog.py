"""File+console logger with optional Slack webhook alerts
(`gst_tacotron/util/infolog.py:36-58` parity; the webhook is best-effort and
never raises — offline environments just log locally)."""
from __future__ import annotations

import atexit
import json
from datetime import datetime
from threading import Thread
from urllib.request import Request, urlopen

_format = "%Y-%m-%d %H:%M:%S.%f"
_file = None
_run_name = None
_slack_url = None


def init(filename, run_name, slack_url=None):
    global _file, _run_name, _slack_url
    _close_logfile()
    _file = open(filename, "a")
    _file.write("\n-----------------------------------------------------------------\n")
    _file.write("Starting new training run\n")
    _file.write("-----------------------------------------------------------------\n")
    _run_name = run_name
    _slack_url = slack_url


def log(msg, slack=False):
    print(msg)
    if _file is not None:
        _file.write(f"[{datetime.now().strftime(_format)[:-3]}]  {msg}\n")
    if slack and _slack_url is not None:
        Thread(target=_send_slack, args=(msg,), daemon=True).start()


def _close_logfile():
    global _file
    if _file is not None:
        _file.close()
        _file = None


def _send_slack(msg):
    try:
        req = Request(_slack_url)
        req.add_header("Content-Type", "application/json")
        urlopen(req, json.dumps({
            "username": f"tts ({_run_name})",
            "icon_emoji": ":taco:",
            "text": f"*{_run_name}*: {msg}",
        }).encode(), timeout=5)
    except Exception:  # noqa: BLE001 — alerts must never kill training
        pass


atexit.register(_close_logfile)
