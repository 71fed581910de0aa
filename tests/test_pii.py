from __future__ import annotations

from sales_data_etl_pipeline_spark.operators import pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_detect_counts(spark):
    df = _docs(
        spark,
        [
            (1, "mail a.b-c_d%x@foo-bar.example.co and j@k.io"),
            (2, "ips 10.0.3.7 and 255.255.255.255 but not 1.2.3.4567"),
            (3, "ssn 123-45-6789 card 4111-1111-1111-1111 alt 4111 1111 1111 1111"),
            (4, "call +1-800-555-0142 or +55-011-555-0199 not 800-555"),
            (5, "nothing personal here"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in pii.pii_detect(df).collect()}
    assert got[1]["n_email"] == 2 and got[1]["has_pii"]
    assert got[2]["n_ipv4"] == 2  # \b keeps 1.2.3.4567 from matching
    assert got[3]["n_ssn"] == 1 and got[3]["n_cc"] == 2
    assert got[4]["n_phone"] == 2
    assert got[5]["n_pii"] == 0 and not got[5]["has_pii"]


def test_pii_redact_replaces_all_kinds(spark):
    df = _docs(
        spark,
        [(1, "x@y.io at 10.0.3.7 ssn 123-45-6789 card 4111-1111-1111-1111 call +1-800-555-0142")],
    )
    row = pii.pii_redact(df).collect()[0]
    assert row["text_clean"] == "<EMAIL> at <IP> ssn <SSN> card <CC> call <PHONE>"
    assert row["n_pii"] == 5


def test_pii_redact_leaves_clean_text_untouched(spark):
    df = _docs(spark, [(1, "just words, no identifiers 123 456")])
    row = pii.pii_redact(df).collect()[0]
    assert row["text_clean"] == "just words, no identifiers 123 456"
    assert row["n_pii"] == 0
