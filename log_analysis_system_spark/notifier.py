"""Email delivery layer for throttled alerts (reference ``src/alerting/
notifier.py:19-309``).

Split of responsibilities, Spark-first:

* **Data plane** — which alerts fire and which are throttled — is computed
  distributed, in :func:`log_analysis_system_spark.state.throttle_alerts`
  (one shuffle over the alert rows, broadcast join against the alert-state
  table). That is the part that must scale to 10^12 turns and it never
  touches this module.
* **Delivery plane** (this module) — rendering one multipart text+HTML
  message per *passed* alert type and handing it to a transport — is
  driver-side by nature (SMTP is a point-to-point protocol) and operates on
  the throttler's output: O(alert types) rows, never O(turns).

Two transports:

* :class:`SmtpTransport` — the reference's exact protocol
  (``notifier.py:186-199``): ``smtplib.SMTP`` + STARTTLS + optional login +
  ``sendmail``. Requires a reachable SMTP server; never the default.
* :class:`SpoolTransport` — offline default: writes each rendered message
  as an RFC-5322 ``.eml`` file into a spool directory. This keeps the full
  rendering path exercised (and testable) in environments without a mail
  relay; any MTA can drain the spool.

Rendering matches the reference section-for-section (``notifier.py:105-183``):
``[Log Analysis Alert]`` subject prefix, plain-text part with an
``Alert Details`` block, HTML part with the same inline-styled table, and
DataFrame/dict/other payload formatting. Spark DataFrames are bounded with
``limit(max_rows)`` *before* ``toPandas`` so a pathological alert payload
cannot materialize unbounded rows on the driver.
"""

from __future__ import annotations

import logging
import os
import smtplib
import ssl
import time
from dataclasses import dataclass, field
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText
from typing import Any, Callable

import pandas as pd

logger = logging.getLogger(__name__)

_HTML_STYLE = """
  body { font-family: Arial, sans-serif; }
  .header { background-color: #f0f0f0; padding: 10px; }
  .content { padding: 15px; }
  table { border-collapse: collapse; width: 100%; }
  th, td { border: 1px solid #ddd; padding: 8px; text-align: left; }
  th { background-color: #f2f2f2; }
  tr:nth-child(even) { background-color: #f9f9f9; }
"""


def _to_pandas_bounded(data: Any, max_rows: int) -> Any:
    """Spark DataFrame -> bounded pandas frame; everything else unchanged."""
    # Duck-typed so the module imports without a SparkSession.
    if hasattr(data, "toPandas") and hasattr(data, "limit"):
        return data.limit(max_rows).toPandas()
    return data


def render_alert_body(
    subject: str, content: str, data: Any, alert_time: str
) -> tuple[str, str]:
    """(text, html) parts with the reference's structure (notifier.py:112-177)."""
    text = f"{content}\n\nAlert Time: {alert_time}\n"
    if data is not None:
        text += "\nAlert Details:\n"
        if isinstance(data, pd.DataFrame):
            text += "\n" + data.to_string() + "\n"
        elif isinstance(data, dict):
            for key, value in data.items():
                text += f"{key}: {value}\n"
        else:
            text += str(data) + "\n"

    html = (
        "<html><head><style>" + _HTML_STYLE + "</style></head><body>"
        f'<div class="header"><h2>{subject}</h2>'
        f"<p>Alert Time: {alert_time}</p></div>"
        f'<div class="content"><p>{content}</p>'
    )
    if data is not None:
        html += "<h3>Alert Details:</h3>"
        if isinstance(data, pd.DataFrame):
            html += data.to_html(index=True)
        elif isinstance(data, dict):
            html += "<table><tr><th>Key</th><th>Value</th></tr>"
            for key, value in data.items():
                html += f"<tr><td>{key}</td><td>{value}</td></tr>"
            html += "</table>"
        else:
            html += f"<pre>{data}</pre>"
    html += "</div></body></html>"
    return text, html


class SpoolTransport:
    """Writes rendered messages as ``.eml`` files under ``spool_dir``."""

    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir

    def send(self, from_address: str, to_addresses: list[str], msg: MIMEMultipart) -> None:
        os.makedirs(self.spool_dir, exist_ok=True)
        n = len([f for f in os.listdir(self.spool_dir) if f.endswith(".eml")])
        path = os.path.join(self.spool_dir, f"alert_{n:06d}.eml")
        with open(path, "w") as f:
            f.write(msg.as_string())
        logger.info("Spooled alert email to %s", path)


class SmtpTransport:
    """The reference's SMTP protocol (notifier.py:186-199)."""

    def __init__(self, server: str, port: int, use_tls: bool, username: str,
                 password: str, smtp_factory: Callable[..., Any] = smtplib.SMTP):
        self.server, self.port, self.use_tls = server, port, use_tls
        self.username, self.password = username, password
        self._smtp_factory = smtp_factory  # injectable for tests

    def send(self, from_address: str, to_addresses: list[str], msg: MIMEMultipart) -> None:
        context = ssl.create_default_context() if self.use_tls else None
        with self._smtp_factory(self.server, self.port) as server:
            if self.use_tls:
                server.starttls(context=context)
            if self.username and self.password:
                server.login(self.username, self.password)
            server.sendmail(from_address, to_addresses, msg.as_string())


@dataclass
class EmailNotifier:
    """Reference-parity notifier (``notifier.py:19-309``).

    ``config`` keys are the reference's: enabled, smtp_server, smtp_port,
    use_tls, username, password, from_address, to_addresses,
    throttle_period — plus ``spool_dir`` (offline transport) and
    ``max_rows`` (driver-side payload bound).

    The in-process throttle dict mirrors ``notifier.py:50-77`` for API
    parity; the batch pipeline's source of truth for throttling remains the
    distributed alert-state table (``state.throttle_alerts``), whose output
    feeds :func:`deliver_throttled_alerts` — rows arriving here have already
    passed the distributed throttle, and this per-process gate only
    suppresses duplicate sends within one driver process.

    ``now_fn`` is injectable: the reference uses wall-clock ``datetime.now``
    (notifier.py:60); tests inject a deterministic clock.
    """

    config: dict
    now_fn: Callable[[], float] = time.time
    last_notification_time: dict[str, float] = field(default_factory=dict)

    def __post_init__(self) -> None:
        c = self.config
        self.enabled = c.get("enabled", False)
        self.smtp_server = c.get("smtp_server", "")
        self.smtp_port = c.get("smtp_port", 587)
        self.use_tls = c.get("use_tls", True)
        self.username = c.get("username", "")
        self.password = c.get("password", "")
        self.from_address = c.get("from_address", "")
        self.to_addresses = list(c.get("to_addresses", []))
        self.throttle_period = c.get("throttle_period", 3600)
        self.max_rows = int(c.get("max_rows", 100))
        spool_dir = c.get("spool_dir", "")
        if self.smtp_server:
            self.transport = SmtpTransport(
                self.smtp_server, self.smtp_port, self.use_tls,
                self.username, self.password,
            )
        elif spool_dir:
            self.transport = SpoolTransport(spool_dir)
        else:
            self.transport = None

    # -- throttling (notifier.py:50-77) ------------------------------------
    def _should_throttle(self, alert_type: str) -> bool:
        now = self.now_fn()
        last = self.last_notification_time.get(alert_type)
        if last is not None and now - last < self.throttle_period:
            logger.info("Throttling %s notification (last sent %.0fs ago)",
                        alert_type, now - last)
            return True
        self.last_notification_time[alert_type] = now
        return False

    # -- core send (notifier.py:79-206) ------------------------------------
    def send_alert(self, subject: str, content: str, data: Any = None,
                   alert_type: str = "general",
                   alert_time: str | None = None) -> bool:
        """Render and deliver one alert; False when disabled, throttled,
        misconfigured, or the transport raises (reference return contract).

        ``alert_time`` is the displayed timestamp; pass the batch's
        data-derived event time for deterministic reruns (defaults to the
        wall clock, matching notifier.py:114).
        """
        if not self.enabled:
            logger.info("Email notifications are disabled, alert not sent")
            return False
        if self._should_throttle(alert_type):
            return False
        if self.transport is None or not self.from_address or not self.to_addresses:
            logger.error("Email configuration incomplete, cannot send alert")
            return False
        try:
            if alert_time is None:
                alert_time = time.strftime(
                    "%Y-%m-%d %H:%M:%S", time.localtime(self.now_fn())
                )
            data = _to_pandas_bounded(data, self.max_rows)
            msg = MIMEMultipart("alternative")
            msg["Subject"] = f"[Log Analysis Alert] {subject}"
            msg["From"] = self.from_address
            msg["To"] = ", ".join(self.to_addresses)
            text, html = render_alert_body(subject, content, data, alert_time)
            msg.attach(MIMEText(text, "plain"))
            msg.attach(MIMEText(html, "html"))
            self.transport.send(self.from_address, self.to_addresses, msg)
            logger.info("Alert email sent to %s: %s",
                        ", ".join(self.to_addresses), subject)
            return True
        except Exception as e:  # reference contract: never raise (notifier.py:204)
            logger.error("Error sending email alert: %s", e)
            return False

    # -- typed wrappers (notifier.py:208-309) ------------------------------
    def send_performance_alert(self, perf_issues, timestamp=None) -> bool:
        if perf_issues is None or len(perf_issues) == 0:
            return False
        subject = f"Performance Issues Detected: {len(perf_issues)} issue(s)"
        content = ("The following performance issues were detected in the "
                   "log analysis:\n\n")
        return self.send_alert(subject, content, pd.DataFrame(perf_issues),
                               alert_type="performance", alert_time=timestamp)

    def send_security_alert(self, security_events, timestamp=None) -> bool:
        if security_events is None or len(security_events) == 0:
            return False
        subject = f"Security Threats Detected: {len(security_events)} event(s)"
        content = ("The following security threats were detected in the "
                   "log analysis:\n\n")
        return self.send_alert(subject, content, pd.DataFrame(security_events),
                               alert_type="security", alert_time=timestamp)

    def send_anomaly_alert(self, anomalies, timestamp=None) -> bool:
        if anomalies is None or len(anomalies) == 0:
            return False
        subject = f"Anomalies Detected: {len(anomalies)} anomaly(ies)"
        content = ("The following anomalies were detected in the "
                   "log analysis:\n\n")
        return self.send_alert(subject, content, pd.DataFrame(anomalies),
                               alert_type="anomaly", alert_time=timestamp)

    def send_daily_summary(self, stats: dict, issues, timeframe) -> bool:
        start_time, end_time = timeframe
        subject = f"Daily Log Analysis Summary: {start_time.strftime('%Y-%m-%d')}"
        period = (f"{start_time.strftime('%Y-%m-%d %H:%M')} to "
                  f"{end_time.strftime('%Y-%m-%d %H:%M')}")
        content = f"Log Analysis Summary for period: {period}\n\n"
        summary_data = {
            "Analysis Period": period,
            "Total Logs Processed": stats.get("total_logs", 0),
            "Unique IP Addresses": stats.get("unique_ips", 0),
            "Average Response Time": f"{stats.get('avg_response_time', 0):.3f}s",
            "Error Rate": f"{stats.get('error_rate', 0):.2%}",
            "Security Events": stats.get("security_events", 0),
            "Performance Issues": stats.get("performance_issues", 0),
            "Anomalies Detected": stats.get("anomalies", 0),
        }
        return self.send_alert(subject, content, summary_data,
                               alert_type="daily_summary")


def deliver_throttled_alerts(
    passed_alerts, notifier: EmailNotifier, alert_rows=None, max_rows: int = 20
) -> int:
    """Deliver one email per alert type that passed the distributed throttle.

    ``passed_alerts`` is :func:`state.throttle_alerts` output
    (alert_type, n_events, max_event_epoch) — O(alert types) rows, safe to
    collect. ``alert_rows`` optionally carries the underlying routed events
    (event_type, event_ts, severity, ...); the top ``max_rows`` per passed
    type (latest first) are embedded as the payload table, limited in Spark
    BEFORE any driver materialization. Returns the number of emails sent.
    """
    rows = passed_alerts.collect()
    sent = 0
    for r in rows:
        data = None
        if alert_rows is not None:
            from pyspark.sql import functions as F  # local: module stays importable sans Spark

            data = (
                alert_rows.where(F.col("event_type") == r["alert_type"])
                .orderBy(F.col("event_ts").desc())
                .limit(max_rows)
            )
        alert_time = time.strftime(
            "%Y-%m-%d %H:%M:%S", time.gmtime(r["max_event_epoch"] or 0)
        )
        ok = notifier.send_alert(
            subject=f"{r['alert_type']}: {r['n_events']} event(s)",
            content=(f"Alert type {r['alert_type']!r} fired with "
                     f"{r['n_events']} event(s) in this batch."),
            data=data,
            alert_type=r["alert_type"],
            alert_time=alert_time,
        )
        sent += int(ok)
    return sent
