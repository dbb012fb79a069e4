"""HTML main-content extraction (DOM walk + boilerplate strip).

The reference has no HTML path; the north rule requires one with the same
*shape* as the PDF path: block segmentation -> boilerplate removal ->
paragraph assembly. Heuristics (each pinned by a unit test):

  * container strip: content under script/style/nav/header/footer/aside/...
    is dropped entirely (tag set in EngineConfig.html_strip_tags),
  * block segmentation: block-level tags delimit paragraphs; <br> splits,
  * whitespace: runs collapsed to single spaces, blocks stripped, empties
    dropped,
  * repeated-block boilerplate: a normalized block text occurring on >=
    ``repeat_threshold`` (3) distinct occurrences is removed everywhere —
    the direct analog of the reference's repeated header/footer counter
    (SmartPDF-OCR ``app/ocr/postprocess.py:315-359``).

Pure function of the input string — shared by the oracle and the Spark UDFs.
Implemented on html.parser (stdlib); no lxml in this sandbox.
"""

from __future__ import annotations

import re
from collections import Counter
from html.parser import HTMLParser

from .config import DEFAULT

_BLOCK_TAGS = {
    "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "td", "th",
    "pre", "blockquote", "section", "article", "tr", "table", "ul", "ol",
    "main", "figure", "figcaption", "dd", "dt", "dl",
}
_VOID_TAGS = {"br", "hr", "img", "input", "meta", "link"}
_WS_RX = re.compile(r"\s+")


# tags legal inside <head>: anything else implicitly closes an
# unclosed <head> (browser behavior — head is auto-closed at the first
# flow-content tag; <body> is optional per spec)
_HEAD_METADATA_TAGS = {"meta", "link", "title", "style", "script",
                       "base", "noscript", "template", "head"}


class _Extractor(HTMLParser):
    def __init__(self, strip_tags):
        super().__init__(convert_charrefs=True)
        self.strip_tags = set(strip_tags)
        # explicit stack of OPEN strip containers, not a bare depth:
        # browsers ignore unmatched end tags, so a stray '</footer>'
        # must not end suppression opened by '<nav>' (review r4)
        self.open_strips: list[str] = []
        self.blocks: list[str] = []
        self.buf: list[str] = []

    def _flush(self):
        raw = "".join(self.buf)
        self.buf = []
        text = _WS_RX.sub(" ", raw).strip()
        if text:
            self.blocks.append(text)

    def handle_starttag(self, tag, attrs):
        if tag == "body":
            # body always ends suppression (recovery for documents that
            # never close boilerplate containers)
            self.open_strips.clear()
        elif tag not in _HEAD_METADATA_TAGS and "head" in self.open_strips:
            # implicit </head> at the first flow-content tag — an
            # unclosed <head> with an omitted <body> previously
            # swallowed the whole document (review r4)
            del self.open_strips[self.open_strips.index("head"):]
        if tag in self.strip_tags:
            self.open_strips.append(tag)
            return
        if self.open_strips:
            return
        if tag in _BLOCK_TAGS or tag in ("br", "hr"):
            self._flush()

    def handle_endtag(self, tag):
        if tag in self.strip_tags:
            # only a tag that is actually open closes suppression, and
            # closing it also closes anything left open inside it
            if tag in self.open_strips:
                i = len(self.open_strips) - 1 \
                    - self.open_strips[::-1].index(tag)
                del self.open_strips[i:]
            return
        if self.open_strips:
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_TAGS:
            self.handle_endtag(tag)

    def handle_data(self, data):
        if not self.open_strips:
            self.buf.append(data)


# strip tags whose content genuinely is not rendered: safe to suppress
# even when left unclosed. The remaining (soft) strip tags — nav, header,
# footer, aside, form, button — are boilerplate CONTAINERS a sloppy
# document may never close; html.parser does no implicit closing, so an
# unclosed one would suppress the whole rest of the document.
_HARD_STRIP = {"script", "style", "noscript", "template", "iframe",
               "svg", "head", "title"}


def _parse_blocks(html: str, strip_tags, repeat_threshold: int):
    """-> (raw_blocks, boilerplate_removed_blocks). The raw list is the
    fallback trigger: 'the parse saw nothing' (unclosed-container
    suppression) and 'everything was legitimately removed as repeated
    boilerplate' must not be conflated (review r4)."""
    parser = _Extractor(strip_tags)
    parser.feed(html)
    parser.close()
    parser._flush()
    blocks = parser.blocks
    counts = Counter(blocks)
    boilerplate = {t for t, c in counts.items() if c >= repeat_threshold}
    return blocks, [b for b in blocks if b not in boilerplate]


def extract_html_blocks(html: str, strip_tags=None,
                        repeat_threshold: int | None = None) -> list:
    """HTML -> list of main-content block texts (boilerplate removed).

    Recovery fallback (code-review r3): if the full strip-tag set
    suppresses EVERYTHING the parse could see — the signature of
    real-world markup like '<body><form>...<p>main content</p>' whose
    boilerplate container never closes (DOM-subtree strippers share
    this hole: a tolerant parser attaches the rest of body under the
    unclosed element) — the document is re-parsed with only the hard
    strip tags, trading some boilerplate leakage for not losing the
    entire turn. The trigger is the PRE-boilerplate block list (r4): a
    document whose every block is legitimately removed as repeated
    boilerplate returns [], it does not resurrect nav chrome."""
    if strip_tags is None:
        strip_tags = DEFAULT.html_strip_tags
    if repeat_threshold is None:
        repeat_threshold = DEFAULT.html_repeat_threshold
    raw, blocks = _parse_blocks(html, strip_tags, repeat_threshold)
    if not raw:
        hard = [t for t in strip_tags if t in _HARD_STRIP]
        if set(hard) != set(strip_tags):
            _, blocks = _parse_blocks(html, hard, repeat_threshold)
    return blocks


def extract_html_text(html: str, **kw) -> str:
    """Blocks joined "\\n\\n" — same assembly as PDF paragraphs (L7)."""
    return "\n\n".join(extract_html_blocks(html, **kw))
