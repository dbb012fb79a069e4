"""HTML DOM-walk extraction heuristics."""

from pdf_ocr_spark.html_extract import extract_html_blocks, extract_html_text


DOC = """<!DOCTYPE html>
<html><head><title>t</title><style>p {color:red}</style>
<script>var x = 1;</script></head>
<body>
<nav>Home | About | Contact</nav>
<header>Site Header</header>
<div><p>First paragraph of   the main content.</p>
<p>Second paragraph.</p></div>
<ul><li>item one</li><li>item two</li></ul>
<footer>Copyright 2026</footer>
</body></html>"""


def test_strip_containers_and_collapse_ws():
    blocks = extract_html_blocks(DOC)
    assert blocks == [
        "First paragraph of the main content.",
        "Second paragraph.",
        "item one",
        "item two",
    ]


def test_text_assembly():
    assert extract_html_text(DOC).startswith(
        "First paragraph of the main content.\n\nSecond paragraph.")


def test_br_splits_blocks():
    blocks = extract_html_blocks("<html><body><p>a<br>b</p></body></html>")
    assert blocks == ["a", "b"]


def test_entities_decoded():
    blocks = extract_html_blocks(
        "<html><body><p>a &amp; b &lt;c&gt;</p></body></html>")
    assert blocks == ["a & b <c>"]


def test_repeated_block_boilerplate_removed():
    html = "<html><body>" + \
        "".join(f"<section><p>Buy now!</p><p>content {i}</p></section>"
                for i in range(3)) + "</body></html>"
    blocks = extract_html_blocks(html)
    assert blocks == ["content 0", "content 1", "content 2"]


def test_repeated_block_below_threshold_kept():
    html = "<html><body>" + \
        "".join(f"<section><p>Buy now!</p><p>content {i}</p></section>"
                for i in range(2)) + "</body></html>"
    blocks = extract_html_blocks(html)
    assert "Buy now!" in blocks


def test_nested_strip_tag():
    html = ("<html><body><nav><div><p>menu</p></div></nav>"
            "<p>real</p></body></html>")
    assert extract_html_blocks(html) == ["real"]


def test_malformed_html_no_crash():
    assert extract_html_blocks("<html><p>unclosed <b>bold") == \
        ["unclosed bold"]


def test_unclosed_boilerplate_container_recovery():
    """Real-world markup whose <form> (or nav/header) never closes must
    not lose the whole document: the recovery fallback re-parses with
    only the hard strip tags (code-review r3)."""
    from pdf_ocr_spark.html_extract import extract_html_blocks
    html = ("<html><body><form action='/q'><input name='x'>"
            "<p>main content survives</p><p>second paragraph</p>")
    blocks = extract_html_blocks(html)
    assert "main content survives" in blocks
    assert "second paragraph" in blocks
    # hard suppressors stay suppressed even in the fallback parse
    html2 = ("<body><form><script>var x = 'dead';</script>"
             "<p>visible</p>")
    blocks2 = extract_html_blocks(html2)
    assert blocks2 == ["visible"]
    # and a well-formed document is unaffected (no fallback triggered)
    html3 = ("<body><nav>menu</nav><p>article text</p>")
    assert extract_html_blocks(html3) == ["article text"]


def test_unclosed_head_without_body_keeps_content():
    """Browsers auto-close <head> at the first flow-content tag; an
    omitted </head> + <body> (both optional per spec) must not swallow
    the document (review r4)."""
    html = '<html><head><meta charset="utf-8"><p>main content</p></html>'
    assert extract_html_blocks(html) == ["main content"]


def test_boilerplate_emptied_doc_does_not_resurrect_chrome():
    """When every body block is legitimately removed as repeated
    boilerplate, the result is [] — the unclosed-container fallback
    must not re-parse and emit nav chrome as 'main content'."""
    html = ('<html><body><nav>Home | Docs | About</nav>'
            + '<p>Buy now!</p>' * 3 + '</body></html>')
    assert extract_html_blocks(html) == []


def test_unmatched_end_tag_does_not_end_suppression():
    """A stray '</footer>' inside an open <nav> is ignored (browser
    behavior): nav boilerplate must not leak."""
    html = ('<html><body><nav>menu</footer> leaked?</nav>'
            '<p>content</p></body></html>')
    assert extract_html_blocks(html) == ["content"]


# --- hypothesis robustness (r5) --------------------------------------------
try:
    from hypothesis import given, settings, strategies as st

    _frag = st.one_of(
        st.sampled_from([
            "<div>", "</div>", "<p>", "</p>", "<br/>", "<span a='b'>",
            "<script>", "</script>", "<style>", "</style>", "<!-- c -->",
            "<nav>", "</nav>", "<html>", "</head>", "<body>", "&amp;",
            "&#x41;", "&bogus;", "<", ">", "</", "<x", "<!DOCTYPE html>",
            "<td", "='", "<![CDATA[", "]]>",
        ]),
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            min_size=0, max_size=12),
    )
    _soup = st.lists(_frag, min_size=0, max_size=40).map("".join)

    @settings(max_examples=150, deadline=None)
    @given(_soup)
    def test_extract_html_text_never_raises_on_tag_soup(soup):
        """Adversarial/malformed markup must never escape as an
        exception (the pipeline contains per-row errors, but the
        extractor itself should be total on arbitrary input), and
        content inside stripped containers must never leak."""
        out = extract_html_text(
            "<html><body><script>SENTINEL_XYZ()</script><p>keep "
            + soup + "</p></body></html>")
        assert isinstance(out, str)
        assert "SENTINEL_XYZ" not in out
except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass
