"""pii_redact and c4_line_filter: hand-computed fixtures plus the
zero-shuffle plan claim (both are row-local Catalyst projections)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from searchengine_spark.operators.scrub import c4_line_filter, pii_redact


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_pii_redact_planted(spark):
    docs = spark.createDataFrame(
        [(1, "mail ann.b-c@sub.example.co.uk and 192.168.0.1 now"),
         (2, "call 555-123-4567 or 555.987.6543 twice"),
         (3, "dot-phone 555.123.4567 must not be eaten as an IP"),
         (4, "user@192.168.1.1 numeric TLD is not an email"),
         (5, "nothing sensitive here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_redact(docs).collect()}

    assert out[1]["text"] == "mail <EMAIL> and <IP> now"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 1, 0)
    # both separators count as phones; the dotted one is NOT an IPv4
    assert out[2]["text"] == "call <PHONE> or <PHONE> twice"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 2)
    assert out[3]["text"] == "dot-phone <PHONE> must not be eaten as an IP"
    assert out[3]["n_ipv4"] == 0 and out[3]["n_phone"] == 1
    # numeric TLD fails the email rule; the IP inside is still masked
    assert out[4]["text"] == "user@<IP> numeric TLD is not an email"
    assert (out[4]["n_email"], out[4]["n_ipv4"]) == (0, 1)
    assert out[5]["text"] == "nothing sensitive here"
    assert (out[5]["n_email"], out[5]["n_ipv4"], out[5]["n_phone"]) == (0, 0, 0)

    assert "Exchange" not in _plan(pii_redact(docs))


def test_c4_line_filter_planted(spark):
    docs = spark.createDataFrame(
        [(1, "A good first line stays.\nshort\nEnable javascript please now.\n"
             "no terminal punctuation on this line\nIs this kept? yes!\n"
             'He said "stop".'),
         (2, "Lorem Ipsum dolor sit amet.\ncode { brace }"),
         (3, "every single line dies here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_line_filter(docs).collect()}

    assert out[1]["text"] == ('A good first line stays.\nIs this kept? yes!\n'
                              'He said "stop".')
    assert (out[1]["n_lines"], out[1]["n_kept"], out[1]["drop_doc"]) \
        == (6, 3, False)
    # line 1 survives the LINE rules but the DOC is flagged (lorem + brace)
    assert (out[2]["n_kept"], out[2]["drop_doc"]) == (1, True)
    # a doc whose every line dies still appears, with empty text
    assert (out[3]["text"], out[3]["n_lines"], out[3]["n_kept"]) == ("", 1, 0)

    assert "Exchange" not in _plan(c4_line_filter(docs))
