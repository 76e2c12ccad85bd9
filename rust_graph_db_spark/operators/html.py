"""HTML → clean-text extraction: the stage ZERO of a crawl-corpus
pipeline (r6 VERDICT "What's missing #1").

Real 100 TB corpora start at WARC/HTML, not clean text; this module is
the trafilatura/jusText-class extraction step (tag stripping,
entity decoding, boilerplate-block removal by link density and phrase
heuristics — Kohlschütter et al., "Boilerplate Detection using Shallow
Text Features", WSDM 2010; Pomikálek, "Removing Boilerplate and
Duplicate Content from Web Corpora", 2011) re-expressed as pure
Catalyst expressions.

Engine discipline (the t14 ``NORMALIZE_RULES`` pattern,
curation.py): every rule lives in a module-level TABLE of RE2-safe
patterns (no lookaround, no backreferences — each scoped tag gets its
own rule instead of a ``</\\1>`` backref) applied in ORDER, and one
builder emits the Spark Column while its ``_sql`` twin emits the
byte-identical DuckDB expression — so the full extraction is
hash-oracled, not spot-checked. All thresholds compare in INTEGER
arithmetic (``link_chars * 100 >= text_chars * pct``), never floats.

100 TB shape: ONE scan, ZERO shuffles, ZERO UDFs — a regexp_replace
chain over the document plus one split + transform/filter/array_join
over its lines (within-document higher-order functions, the t20
discipline). Parallelizes embarrassingly; cost is compute-bound
per-document like every extractor.

The reference (rust-graph-db) has no corpus tooling at all (SURVEY.md
§2 note) — this is extension canon, same status as the dedup/curation
families.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Structural pass, applied in ORDER to the whole document.
#: RE2-safe: per-tag scoped rules instead of a backreference.
HTML_STRIP_RULES = (
    # invisible / non-content subtrees (content dropped entirely)
    ("(?is)<script\\b[^>]*>.*?</script>", ""),
    ("(?is)<style\\b[^>]*>.*?</style>", ""),
    ("(?is)<noscript\\b[^>]*>.*?</noscript>", ""),
    ("(?is)<svg\\b[^>]*>.*?</svg>", ""),
    ("(?is)<iframe\\b[^>]*>.*?</iframe>", ""),
    ("(?is)<head\\b[^>]*>.*?</head>", ""),
    # comments (non-greedy; RE2 and Java agree)
    ("(?s)<!--.*?-->", ""),
    # block-level boundaries become line breaks so the per-LINE
    # boilerplate heuristics below see the page's block structure
    ("(?i)</?(p|br|div|li|ul|ol|table|tr|td|th|h1|h2|h3|h4|h5|h6|"
     "section|article|header|footer|nav|aside|blockquote|pre|form|"
     "fieldset|select|option|dl|dt|dd|hr|main|figure|figcaption|"
     "title|body|html)\\b[^>]*>", "\n"),
)

#: Per-line inline-anchor matcher: the chars its text contributes are
#: the line's LINK chars (jusText/boilerpipe link density). An anchor
#: broken across block boundaries is already split by the \n rules
#: and its dangling tags fall to the generic strip (counted as text).
_ANCHOR = "(?is)<a\\b[^>]*>.*?</a>"

#: Generic tag strip (applied per line, AFTER link accounting):
#: only things that lex like a tag — a bare '<' in prose survives.
_TAG = "</?[a-zA-Z!][^>]*>"

#: Entity decode table, applied in ORDER — '&amp;' LAST so
#: '&amp;nbsp;' decodes to the literal text '&nbsp;', per the HTML
#: spec, never double-decodes. Literal replace(), not regex.
ENTITY_RULES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", "\""),
    ("&#34;", "\""),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&#8216;", "'"),
    ("&#8217;", "'"),
    ("&#8220;", "\""),
    ("&#8221;", "\""),
    ("&mdash;", "-"),
    ("&ndash;", "-"),
    ("&hellip;", "..."),
    ("&copy;", "©"),
    ("&amp;", "&"),
)

#: Drop a line whose CLEANED, LOWERCASED text matches any pattern —
#: the phrase half of boilerplate removal (the link-density half is
#: structural). Tuned to the universal chrome every site carries;
#: extend the table, not the code.
BOILERPLATE_LINE_RULES = (
    # legal / footer chrome (anywhere in a short line)
    "(all rights reserved|privacy policy|terms of (use|service)|"
    "cookie (policy|notice|settings|consent)|©|\\(c\\) (19|20)[0-9]{2})",
    # standalone nav / widget labels (whole line)
    "^(skip to (main )?content|back to top|read more|advertisement|"
    "sponsored( content)?|share (this|on)[a-z ]*|follow us[a-z ]*|"
    "(home|menu|search|log ?in|sign ?(in|up)|register|subscribe)"
    "([ |•·>»/-]+(home|menu|search|about( us)?|contact( us)?|"
    "log ?in|sign ?(in|up)|register|subscribe|help|faq))*)$",
)

#: Boilerplate phrase rules only fire on SHORT lines — a long
#: paragraph that happens to mention "privacy policy" is content.
_PHRASE_MAX_LEN = 120


def _clean_line(line, engine: str):
    """The shared per-line text pipeline, emitted for either engine:
    strip tags → decode entities → collapse whitespace → trim.
    ``line`` is a Column (spark) or a SQL expression string (duckdb).
    """
    if engine == "spark":
        c = F.regexp_replace(line, _TAG, " ")
        for lit, rep in ENTITY_RULES:
            c = F.replace(c, F.lit(lit), F.lit(rep))
        return F.trim(F.regexp_replace(c, r"\s+", " "))
    c = f"regexp_replace({line}, '{_TAG}', ' ', 'g')"
    for lit, rep in ENTITY_RULES:
        rl = lit.replace("'", "''")
        rr = rep.replace("'", "''")
        c = f"replace({c}, '{rl}', '{rr}')"
    return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"


def _structural(html, engine: str):
    """Whole-document structural pass for either engine: drop
    invisible subtrees + comments, fold block tags to newlines."""
    if engine == "spark":
        c = F.coalesce(html, F.lit(""))
        for pat, rep in HTML_STRIP_RULES:
            c = F.regexp_replace(c, pat, rep)
        return c
    c = f"coalesce({html}, '')"
    for pat, rep in HTML_STRIP_RULES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
        c = f"regexp_replace({c}, '{p}', '{r}', 'g')"
    return c


def _phrase_pred_sql(txt: str) -> str:
    alts = " OR ".join(
        f"regexp_matches(lower({txt}), '{p}')"
        for p in (q.replace("'", "''") for q in BOILERPLATE_LINE_RULES))
    return (f"(length({txt}) <= {_PHRASE_MAX_LEN} AND ({alts}))")


def html_extract(df: DataFrame, html_col: str = "html",
                 out_col: str = "text",
                 min_text_len: int = 25,
                 max_link_pct: int = 50) -> DataFrame:
    """Extract main-content text from an HTML column.

    Pipeline (all Catalyst, one scan, no shuffle, no UDF):

    1. structural pass (``HTML_STRIP_RULES``): drop
       script/style/noscript/svg/iframe/head subtrees and comments,
       fold block-level tags to line breaks;
    2. split into lines; per line compute the cleaned text
       (tag strip → ``ENTITY_RULES`` decode → whitespace collapse)
       and its LINK chars (text contributed by inline ``<a>…</a>``);
    3. keep a line iff it has text, its link density stays under
       ``max_link_pct`` percent (integer compare:
       ``link*100 < text*pct``), it is not a short link-bearing
       crumb (``link_chars > 0 and text < min_text_len``), and no
       ``BOILERPLATE_LINE_RULES`` phrase fires on a line ≤ 120 chars;
    4. join survivors with newlines.

    Adds ``out_col`` (the extracted text), ``n_kept`` and
    ``n_dropped`` (INT counts of non-empty lines kept/dropped — the
    observability hook quality dashboards bucket on). The DuckDB twin
    is :func:`html_extract_sql`; both engines run the SAME rule
    tables, so the stage is hash-oracled end-to-end (t21).
    """
    pct = int(max_link_pct)
    mtl = int(min_text_len)

    lines = F.split(_structural(F.col(html_col), "spark"), "\n")

    def feat(l):
        txt = _clean_line(l, "spark")
        nolink = _clean_line(F.regexp_replace(l, _ANCHOR, " "), "spark")
        lc = F.greatest(F.length(txt) - F.length(nolink), F.lit(0))
        return F.struct(txt.alias("t"), lc.alias("lc"))

    feats = F.filter(F.transform(lines, feat),
                     lambda s: F.length(s["t"]) > 0)

    def is_phrase(t):
        low = F.lower(t)
        hit = F.lit(False)
        for p in BOILERPLATE_LINE_RULES:
            hit = hit | (F.regexp_count(low, F.lit(p)) > 0)
        return (F.length(t) <= _PHRASE_MAX_LEN) & hit

    def keep(s):
        t, lc = s["t"], s["lc"]
        return (
            (lc * 100 < F.length(t) * pct)
            & ~((lc > 0) & (F.length(t) < mtl))
            & ~is_phrase(t))

    kept = F.filter(feats, keep)
    return (df.withColumn("_k", kept)
            .withColumn("_n", F.size(feats))
            .withColumn(out_col,
                        F.array_join(F.transform(
                            F.col("_k"), lambda s: s["t"]), "\n"))
            .withColumn("n_kept", F.size("_k").cast("int"))
            .withColumn("n_dropped",
                        (F.col("_n") - F.size("_k")).cast("int"))
            .drop("_k", "_n"))


def html_extract_sql(expr: str, min_text_len: int = 25,
                     max_link_pct: int = 50) -> str:
    """DuckDB twin of :func:`html_extract` over SQL expression
    ``expr`` — returns a STRUCT(text, n_kept, n_dropped) expression
    built from the SAME rule tables (the t14 ``normalize_text_sql``
    discipline), so the t21 oracle replays the extraction
    byte-for-byte. Uses list lambdas (list_transform/list_filter),
    exact integer comparisons throughout."""
    pct = int(max_link_pct)
    mtl = int(min_text_len)
    anchor = _ANCHOR.replace("'", "''")
    txt = _clean_line("l", "duckdb")
    nolink = _clean_line(
        f"regexp_replace(l, '{anchor}', ' ', 'g')", "duckdb")
    feats = (
        f"list_filter(list_transform("
        f"string_split({_structural(expr, 'duckdb')}, chr(10)), "
        f"l -> {{'t': {txt}, "
        f"'lc': greatest(length({txt}) - length({nolink}), 0)}}), "
        f"s -> length(s.t) > 0)")
    phrase = _phrase_pred_sql("s.t")
    keep = (f"s.lc * 100 < length(s.t) * {pct} "
            f"AND NOT (s.lc > 0 AND length(s.t) < {mtl}) "
            f"AND NOT {phrase}")
    return (
        f"(SELECT {{'text': coalesce(array_to_string("
        f"list_transform(k, s -> s.t), chr(10)), ''), "
        f"'n_kept': CAST(len(k) AS INT), "
        f"'n_dropped': CAST(len(f) - len(k) AS INT)}} "
        f"FROM (SELECT {feats} AS f, "
        f"list_filter({feats}, s -> {keep}) AS k))")
