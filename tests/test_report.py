"""K8 email/report sink: HTML rendering from the G5 metrics table and
the real SMTP send path against an in-process listener (the one
connector whose protocol needs no external service)."""

from __future__ import annotations

import socket
import threading

import pytest

from pipeline_airflow_docker_spark.plans.reference_ops import q_pipeline_metrics
from pipeline_airflow_docker_spark.sinks.report import (
    render_report_html,
    send_email_report,
)


def test_render_report_from_g5_metrics_table(spark, sf_dir):
    metrics = q_pipeline_metrics(spark, sf_dir)
    expected = {r.stage: r.n_rows for r in metrics.collect()}
    html = render_report_html(
        metrics, title="ETL run", timestamp="2026-08-15 00:00:00"
    )
    assert "<h2>ETL run</h2>" in html
    assert "<th>stage</th><th>n_rows</th>" in html
    for stage, n in expected.items():
        assert f"<td>{stage}</td><td>{n}</td>" in html
    assert "Timestamp: 2026-08-15 00:00:00" in html


def test_render_report_from_xcom_mapping_and_escaping():
    # The reference renders xcom_pull'ed counts
    # [ref dags/kafka_to_mongo_pipeline_enchanced.py:167-183]; labels
    # and values must be HTML-escaped.
    html = render_report_html(
        {"processed_items": 42, "<script>": "a&b"}, title="<T>"
    )
    assert "<td>processed_items</td><td>42</td>" in html
    assert "&lt;script&gt;" in html and "a&amp;b" in html
    assert "<h2>&lt;T&gt;</h2>" in html
    assert "<script>" not in html


def test_render_report_refuses_fact_sized_input(spark):
    fact = spark.range(50).selectExpr("id", "id * 2 AS v")
    with pytest.raises(ValueError, match="max_rows"):
        render_report_html(fact, max_rows=10)


class _FakeSMTP(threading.Thread):
    """Minimal RFC 5321 happy-path listener capturing one message."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.data = b""

    def run(self) -> None:
        conn, _ = self.sock.accept()
        f = conn.makefile("rb")
        conn.sendall(b"220 fake ESMTP\r\n")
        in_data = False
        while True:
            line = f.readline()
            if not line:
                break
            if in_data:
                if line.rstrip(b"\r\n") == b".":
                    in_data = False
                    conn.sendall(b"250 OK\r\n")
                else:
                    self.data += line
                continue
            verb = line.split(b":")[0].split(b" ")[0].upper().rstrip(b"\r\n")
            if verb in (b"EHLO", b"HELO"):
                conn.sendall(b"250 fake\r\n")
            elif verb == b"DATA":
                in_data = True
                conn.sendall(b"354 go\r\n")
            elif verb == b"QUIT":
                conn.sendall(b"221 bye\r\n")
                break
            else:
                conn.sendall(b"250 OK\r\n")
        conn.close()
        self.sock.close()


def test_send_email_report_speaks_smtp():
    srv = _FakeSMTP()
    srv.start()
    html = render_report_html({"processed_items": 7})
    send_email_report(
        html,
        subject="Airflow Pipeline Execution Report",
        sender="engine@localhost",
        recipients=["ops@localhost"],
        host="127.0.0.1",
        port=srv.port,
    )
    srv.join(timeout=5)
    assert b"Subject: Airflow Pipeline Execution Report" in srv.data
    assert b"processed_items" in srv.data
