"""Extractor goldens (FIXTURES.md §5): byte-identical html→text."""

from sparksearch.extract import extract_text


def test_basic_template():
    html = (b"<html><head><title>t</title></head><body><p>hello world</p>"
            b"<script>skip()</script></body></html>")
    assert extract_text(html) == "hello world"


def test_nested_tags():
    assert extract_text("<div><b>bold <i>italic</i></b> tail</div>") == \
        "bold italic tail"


def test_script_style_head_content_dropped():
    assert extract_text("<style>.x{color:red}</style>a<script>var x=1;</script>b") == "ab"
    assert extract_text("<head><title>Page Title</title></head>body text") == "body text"


def test_comments_stripped():
    assert extract_text("a<!-- comment with <tags> -->b") == "ab"


def test_entities_decoded():
    assert extract_text("fish &amp; chips &lt;3 &#65; &nbsp;x") == "fish & chips <3 A \xa0x"


def test_unicode_preserved():
    assert extract_text("<p>café 中文</p>") == "café 中文"


def test_cdata():
    assert extract_text("a<![CDATA[ raw <stuff> ]]>b") == "ab"


def test_bytes_utf8():
    assert extract_text("<p>café</p>".encode()) == "café"


def test_idempotent_on_plain_text():
    assert extract_text("plain words only") == "plain words only"


def test_attributes_with_gt_free_values():
    assert extract_text('<a href="http://x.example/p">link text</a>') == "link text"


def test_gt_inside_quoted_attribute():
    assert extract_text('<div attr="a>b"><p>keep</p></div>') == "keep"
    assert extract_text("<script type=\"a>b\">drop()</script>x") == "x"
