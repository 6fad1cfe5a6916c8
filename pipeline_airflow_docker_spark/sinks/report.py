"""K8 email/report sink — the engine half of the reference's
execution-report task.

[ref dags/kafka_to_mongo_pipeline_enchanced.py:167-183] renders an
HTML report from XCom-pulled processed counts and mails it with an
``EmailOperator`` (ibid.:219-224; static-content variant
dags/etl_data_pipeline_mongodb_complex.py:129-135). Here the metrics
come from the G5 metrics TABLE (plans/reference_ops.py::
q_pipeline_metrics) — computed from data, hence replayable — and the
rendering is a pure function of that table. The SMTP send is a thin
stdlib wrapper (the orchestration layer's ``EmailOperator`` does the
same); tests drive it against an in-process SMTP listener, so unlike
the Kafka/Mongo connectors the full send path runs without external
services.

Scale note: a metrics table is O(#pipeline stages) rows by
construction. ``render_report_html`` still enforces ``max_rows`` so a
fact table passed by mistake fails loudly instead of collecting 100 TB
onto the driver.
"""

from __future__ import annotations

import smtplib
from collections.abc import Mapping
from email.mime.text import MIMEText
from html import escape

from pyspark.sql import DataFrame


def render_report_html(
    metrics: DataFrame | Mapping[str, object],
    title: str = "Pipeline Execution Report",
    timestamp: str | None = None,
    max_rows: int = 1000,
) -> str:
    """Render a metrics table (or an XCom-style mapping) as the
    reference's HTML execution report.

    Accepts the G5 metrics DataFrame (first column = metric label,
    remaining columns = values) or a plain mapping (the reference's
    ``xcom_pull`` dict). Values are HTML-escaped. ``timestamp`` is
    caller-injected (the reference stamps ``datetime.now()`` at render
    time; injection keeps rendering deterministic and replayable).
    """
    if isinstance(metrics, Mapping):
        header = ["metric", "value"]
        rows = [(str(k), (v,)) for k, v in metrics.items()]
    else:
        cols = metrics.columns
        if not cols:
            raise ValueError("metrics DataFrame has no columns")
        collected = metrics.limit(max_rows + 1).collect()
        if len(collected) > max_rows:
            raise ValueError(
                f"metrics table exceeds max_rows={max_rows}; a report "
                "renders per-stage METRICS (e.g. q_pipeline_metrics "
                "output), not fact data — aggregate first"
            )
        header = list(cols)
        rows = [(str(r[0]), tuple(r[1:])) for r in collected]

    body = "\n".join(
        "      <tr><td>{}</td>{}</tr>".format(
            escape(label),
            "".join(f"<td>{escape(str(v))}</td>" for v in values),
        )
        for label, values in rows
    )
    head = "".join(f"<th>{escape(c)}</th>" for c in header)
    stamp = (
        f"\n    <p>Timestamp: {escape(timestamp)}</p>" if timestamp else ""
    )
    return f"""<html>
  <body>
    <h2>{escape(title)}</h2>
    <table border="1">
      <tr>{head}</tr>
{body}
    </table>{stamp}
  </body>
</html>"""


def send_email_report(
    html: str,
    subject: str,
    sender: str,
    recipients: list[str],
    host: str = "localhost",
    port: int = 25,
    timeout: float = 10.0,
) -> None:
    """Send a rendered report over SMTP — the engine-side equivalent
    of the reference's ``EmailOperator`` send
    [ref dags/kafka_to_mongo_pipeline_enchanced.py:219-224]."""
    msg = MIMEText(html, "html")
    msg["Subject"] = subject
    msg["From"] = sender
    msg["To"] = ", ".join(recipients)
    with smtplib.SMTP(host, port, timeout=timeout) as smtp:
        smtp.sendmail(sender, recipients, msg.as_string())
