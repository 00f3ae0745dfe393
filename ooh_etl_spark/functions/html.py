"""The reference's CDATA-HTML parsing surface as column expressions.

Each function re-expresses one §2.A operator (SURVEY.md) as a pure
``Column -> Column`` built from Spark built-ins (``xpath``, ``regexp_*``,
higher-order array/map functions) — set-oriented, zero Python boundary
crossings, fully inside WholeStageCodegen. The reference parses each
fragment into a row-level DOM (jsdom) and loops; here the *expression*
is the parser.

Reference citations are to /root/reference/index.js.

Well-formedness: Spark's ``xpath`` requires well-formed XML. Real OOH
CDATA is treated as XHTML; for fragments that are not well-formed, the
same signatures are available over a stdlib-HTMLParser pandas UDF in
:mod:`ooh_etl_spark.functions.html_fallback`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# E9 pattern (index.js:143): regex applied to the whitespace-collapsed
# CDATA text of work_environment/section_body; group 3 = paragraph body.
WORK_SCHEDULES_PATTERN = (
    r"<h3>( |<strong>)?Work [Ss]chedules?( |</strong>)?</h3> ?<p> ?(.+) ?</p>"
)

# E10 pattern (index.js:144): group 4 = everything after the heading.
IMPORTANT_QUALITIES_PATTERN = (
    r"<h3>( |<strong>)?Important [Qq]ualities?(&nbsp;)?( |</strong>)?</h3>(.*)"
)

# E6 patterns (index.js:59,70): first-match-anywhere per paragraph.
ANNUAL_WAGE_PATTERN = r"The median annual wage for (.+) was \$(\d+,\d{3})"
HOURLY_WAGE_PATTERN = r"The median hourly wage for (.+) was \$(\d+\.\d{2})"

WORK_YEAR_HOURS = 2080  # 52 weeks × 40 h (index.js:65)


# Characters outside the XML 1.0 Char production (control chars,
# unpaired surrogates). ``xpath()`` throws a SAXParseException on them
# — a single dirty row would fail the whole job — while the reference's
# lenient HTML parser ignores them; stripping is the closest total
# semantics (found by property testing, tests/test_properties.py).
_XML_INVALID = r"[^\x09\x0A\x0D\x20-퟿-�\x{10000}-\x{10FFFF}]"


def wrap_fragment(html: Column) -> Column:
    """Wrap an HTML fragment so ``xpath`` sees a single-rooted document
    (jsdom wraps fragments in <html><body> implicitly; index.js:3-5),
    with XML-invalid characters stripped and bare ampersands escaped
    for totality. Domain contract: input is XHTML-ish markup — input
    with stray ``<``/``>`` that is not markup needs the lenient parser
    in :mod:`ooh_etl_spark.functions.html_fallback` instead.
    """
    cleaned = F.regexp_replace(F.coalesce(html, F.lit("")), _XML_INVALID, "")
    cleaned = F.regexp_replace(
        cleaned, r"&(?!(?:[a-zA-Z][a-zA-Z0-9]*|#[0-9]+|#x[0-9a-fA-F]+);)", "&amp;"
    )
    return F.concat(F.lit("<root>"), cleaned, F.lit("</root>"))


def collapse_ws(text: Column) -> Column:
    """``replace(/[\\s\\t\\r\\n]+/gm, ' ')`` (index.js:110,117)."""
    return F.regexp_replace(text, r"\s+", " ")


def xpath_texts(html: Column, xp: str) -> Column:
    """Node-set string values for a fragment (E1, index.js:7-17)."""
    return F.xpath(wrap_fragment(html), F.lit(xp))


def xpath_concat(html: Column, xp: str = "//p//text()") -> Column:
    """E4 (index.js:23-38): concatenated text of all matches, in
    document order — ``textContent`` accumulation without the DOM."""
    return F.array_join(xpath_texts(html, xp), "")


def xpath_match_count(html: Column, xp: str = "//p") -> Column:
    """E4's warn path (index.js:33-35): the reference logs when the
    match count ≠ 1; surfaced as a derived column instead."""
    return F.size(xpath_texts(html, xp))


def extract_trimmed_list(html: Column, xp: str = "//td//h4/text()") -> Column:
    """E7 (index.js:87-93): node list → per-element trimmed strings."""
    return F.transform(xpath_texts(html, xp), lambda e: F.trim(e))


def cells_to_map(html: Column, xp: str = "//td/text()") -> Column:
    """E8 (index.js:95-106): alternating cells → dict; even index = key,
    odd = value with '%' stripped (index.js:102)."""
    cells = xpath_texts(html, xp)
    keys = F.filter(cells, lambda _, i: i % 2 == 0)
    vals = F.transform(
        F.filter(cells, lambda _, i: i % 2 == 1),
        lambda v: F.regexp_replace(v, "%", ""),
    )
    return F.map_from_arrays(keys, vals)


def extract_after_heading(
    text: Column, pattern: str = WORK_SCHEDULES_PATTERN, group: int = 3
) -> Column:
    """E9 (index.js:108-113): whitespace-collapse then regex capture;
    NULL (not '') when the heading is absent — ``match && match[3]``."""
    collapsed = collapse_ws(text)
    extracted = F.regexp_extract(collapsed, pattern, group)
    return F.when(collapsed.rlike(pattern), extracted)


def _sentence_split_entry(p: Column) -> Column:
    """Key/value split at the first '. ' (index.js:124-127), including
    the JS edge case where the separator is absent (indexOf = -1 →
    slice(0,-1) / slice(1))."""
    pos = F.instr(p, ". ")
    return F.when(
        pos > 0,
        F.struct(
            p.substr(F.lit(1), pos - 1).alias("key"),
            p.substr(pos + 2, F.length(p)).alias("value"),
        ),
    ).otherwise(
        F.struct(
            p.substr(F.lit(1), F.length(p) - 1).alias("key"),
            p.substr(F.lit(2), F.length(p)).alias("value"),
        )
    )


def qualities_map(text: Column) -> Column:
    """E10 (index.js:115-133): locate the Important Qualities section,
    truncate at the next <h3>, split each paragraph into key → sentence.
    NULL when the section is absent (``match && getIqDict()``)."""
    collapsed = collapse_ws(text)
    section = F.substring_index(
        F.regexp_extract(collapsed, IMPORTANT_QUALITIES_PATTERN, 4), "<h3>", 1
    )
    ps = xpath_texts(section, "//p/text()")
    entries = F.transform(ps, _sentence_split_entry)
    return F.when(collapsed.rlike(IMPORTANT_QUALITIES_PATTERN), F.map_from_entries(entries))


def _wage_entry(p: Column) -> Column:
    """E6 (index.js:57-85): per-paragraph wage extraction. Annual takes
    precedence; hourly fallback; NULL entry when neither matches."""
    annual_sub = F.regexp_extract(p, ANNUAL_WAGE_PATTERN, 1)
    annual_amt = F.regexp_extract(p, ANNUAL_WAGE_PATTERN, 2)
    hourly_sub = F.regexp_extract(p, HOURLY_WAGE_PATTERN, 1)
    hourly_amt = F.regexp_extract(p, HOURLY_WAGE_PATTERN, 2)
    # try_cast: the regex guarantees digits when matched, but ANSI-mode
    # cast('' as double) in the not-taken branch must never throw under
    # an optimizer that folds eagerly.
    annual_hourly = F.round(
        F.regexp_replace(annual_amt, ",", "").try_cast("double") / WORK_YEAR_HOURS, 2
    )
    return (
        F.when(
            annual_amt != "",
            F.struct(annual_sub.alias("key"), annual_hourly.alias("value")),
        )
        .when(
            hourly_amt != "",
            F.struct(
                hourly_sub.alias("key"), hourly_amt.try_cast("double").alias("value")
            ),
        )
        .otherwise(F.lit(None))
    )


def pay_map(html: Column) -> Column:
    """E6: suboccupation → normalized hourly wage ($/h, 2 dp).

    Requires ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` to mirror the
    reference's JS-object overwrite semantics (index.js:63-66).
    """
    ps = xpath_texts(html, "//p/text()")
    entries = F.filter(F.transform(ps, _wage_entry), lambda e: e.isNotNull())
    return F.map_from_entries(entries)


def pay_text(html: Column) -> Column:
    """E6's concatenated raw text side-channel (cdataParser innerText,
    index.js:49,53)."""
    return xpath_concat(html, "//p//text()")
