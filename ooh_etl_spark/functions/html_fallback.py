"""Messy-HTML fallback for the §2.A parsing surface.

``xpath()`` requires well-formed XML (SURVEY.md §7.3.7); real OOH CDATA
may not be. This module provides the same text-extraction semantics as
a browser DOM (``textContent`` over lenient HTML) using the stdlib
``html.parser`` inside an Arrow-batched pandas UDF — the sanctioned
slow path: vectorized batch transfer, no row-at-a-time pickling, and
only used when the codegen'd ``xpath`` path cannot parse the input.

lxml is not available in this environment; ``html.parser`` is lenient
(auto-closes <p>, tolerates unclosed tags) which is exactly the jsdom
behavior the reference relies on (index.js:3-5).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tags that close an open <p> implicitly (HTML5 subset relevant here).
_P_CLOSERS = {"p", "table", "h1", "h2", "h3", "h4", "ul", "ol", "div"}

_VOID = {"br", "hr", "img", "input", "meta", "link"}


class _TagTextCollector(HTMLParser):
    """Collect per-element text content of ``target`` elements,
    optionally restricted to those with an ``ancestor`` tag open
    (emulating the '//ancestor//target' XPath used at index.js:90)."""

    def __init__(self, target: str, ancestor: str | None = None) -> None:
        super().__init__(convert_charrefs=True)
        self.target = target
        self.ancestor = ancestor
        self.stack: list[str] = []
        self.open_targets: list[list[str]] = []
        self.texts: list[str] = []

    def handle_starttag(self, tag, attrs):  # noqa: ANN001
        if tag in _VOID:
            return
        if tag in _P_CLOSERS and self.stack and self.stack[-1] == "p":
            self._pop()
        self.stack.append(tag)
        if tag == self.target and (
            self.ancestor is None or self.ancestor in self.stack[:-1]
        ):
            self.open_targets.append([])

    def handle_endtag(self, tag):  # noqa: ANN001
        while self.stack:
            top = self._pop()
            if top == tag:
                break

    def _pop(self) -> str:
        top = self.stack.pop()
        if top == self.target and self.open_targets:
            self.texts.append("".join(self.open_targets.pop()))
        return top

    def handle_data(self, data):  # noqa: ANN001
        for buf in self.open_targets:
            buf.append(data)

    def close(self) -> None:
        super().close()
        while self.stack:
            self._pop()


def _collect(html: str | None, target: str, ancestor: str | None) -> list[str]:
    if html is None:
        return []
    c = _TagTextCollector(target, ancestor)
    c.feed(html)
    c.close()
    return c.texts


def tag_texts(html: Column, target: str, ancestor: str | None = None) -> Column:
    """Per-element ``textContent`` of every ``target`` element — the
    lenient-DOM equivalent of ``xpath(html, '//target')``."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda h: _collect(h, target, ancestor))

    return _udf(html)


def tag_text_concat(html: Column, target: str) -> Column:
    """Lenient-DOM equivalent of E4's concatenation (index.js:23-38)."""
    return F.array_join(tag_texts(html, target), "")
