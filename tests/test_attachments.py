"""ingest-attachment analogue: PDF writer/extractor round trip, sniffing,
and the mapInPandas processor (AttachmentProcessor.java:132-200 parity)."""

from sparksearch.attachments import (extract_attachment, ingest_attachment,
                                     make_pdf, pdf_extract, sniff_type)


def test_pdf_roundtrip_byte_identical():
    texts = [
        "hello world",
        "parens (and) more (nested (deep)) plus backslash \\ and ) stray",
        "unicode éß中文 mixed",
        "tabs\tand\nnewlines\rcr",
        "",
    ]
    for t in texts:
        for comp in (True, False):
            content, title = pdf_extract(make_pdf(t, title="T", compress=comp))
            assert content == t.strip(), (t, comp)
            assert title == "T"


def test_pdf_roundtrip_large_compressed():
    import random
    import string
    random.seed(7)
    t = " ".join("".join(random.choices(string.ascii_lowercase, k=6))
                 for _ in range(5000))
    assert pdf_extract(make_pdf(t))[0] == t


def test_pdf_tj_array_and_linebreaks():
    content = (b"BT /F1 11 Tf 72 720 Td [ (ab) -120 (cd) ] TJ "
               b"T* (second) Tj ET")
    body = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF")
    assert pdf_extract(body)[0] == "abcd\nsecond"


def test_pdf_quote_op_and_hex_string():
    content = b"BT (first) Tj (next line) ' <68690a> Tj ET"
    body = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF")
    assert pdf_extract(body)[0] == "first\nnext linehi"


def test_sniff_and_dispatch():
    assert sniff_type(make_pdf("x")) == "application/pdf"
    assert sniff_type(b"<html><body>x</body></html>") == "text/html"
    assert sniff_type(b"plain words") == "text/plain"
    assert sniff_type(b"\xff\xfe\x00\x01") == "application/octet-stream"
    assert extract_attachment(b"hi <b")["content_type"] == "text/plain"
    r = extract_attachment(make_pdf("abc def"))
    assert r == {"content": "abc def", "content_type": "application/pdf",
                 "content_length": 7, "title": None}


def test_html_content_via_processor():
    r = extract_attachment(b"<html><body>hi <b>there</b></body></html>")
    assert r["content"] == "hi there"
    assert r["content_type"] == "text/html"


def test_ingest_attachment_processor(spark):
    rows = [(1, make_pdf("alpha beta", title="one")),
            (2, b"<html><body>gamma <i>delta</i></body></html>"),
            (3, b"plain epsilon"),
            (4, b"\x00\x01\xff\xfe"),
            (5, None)]
    df = spark.createDataFrame(rows, "doc_id int, data binary")
    out = {r["doc_id"]: r for r in
           ingest_attachment(df, field="data").collect()}
    assert out[1]["attachment_content"] == "alpha beta"
    assert out[1]["attachment_content_type"] == "application/pdf"
    assert out[1]["attachment_content_length"] == 10
    assert out[1]["attachment_title"] == "one"
    assert out[2]["attachment_content"] == "gamma delta"
    assert out[2]["attachment_content_type"] == "text/html"
    assert out[3]["attachment_content"] == "plain epsilon"
    assert out[4]["attachment_content"] == ""
    assert out[4]["attachment_content_type"] == "application/octet-stream"
    assert out[5]["attachment_content"] == ""
