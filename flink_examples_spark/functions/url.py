"""URL normalization + synthesis for the crawl pre-text stage.

The RefinedWeb/C4-style pipeline dedups by NORMALIZED URL before it
ever looks at text (one page crawled as ``http://www.h/p?utm=..`` and
``https://h/p/`` is one document), then drops boilerplate/link-farm
hosts by per-host duplication censuses. ``normalize_url`` is that
operator: scheme + ``www.`` strip, query-string/fragment strip,
trailing-slash strip, lowercase. Pure built-in expressions (regexes in
the Java/RE2 common subset) — whole-stage-codegen, no UDF.

The testdata ``documents`` table carries no URL column, so
``synthetic_crawl_url`` derives a deterministic crawl-like raw URL
from (doc_id, source): hash60-bucketed paths force canonical
collisions (the re-crawl duplicates the dedup exists for) and the
doc_id residues sprinkle every noise class the normalizer must strip.
Replayable in any engine (the hash60/md5 idiom) — the DuckDB oracles
mirror it term for term. At a real deployment this column comes from
the crawl metadata and ``synthetic_crawl_url`` is simply not called.

Cited against the reference's enrichment/normalization map stage
(IpToLocation.java:24-38 — derive a canonical key from a raw field,
then key by it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from flink_examples_spark.functions.text import hash60

#: number of hash-bucketed paths per host in the synthetic URL space —
#: small enough that hosts collide on canonical URLs at every sf
SYNTH_PATH_BUCKETS = 40


def synthetic_crawl_url(doc_id: Column | str, source: Column | str) -> Column:
    """Deterministic crawl-like raw URL for a document (see module
    doc): ``{http|https}://[www.]{source}.example.com/p/{bucket}[/]
    [?utm_source=...][#sec-...]`` — every noise class keyed off a
    different doc_id residue so normalization is actually exercised."""
    d = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    s = F.col(source) if isinstance(source, str) else source
    sch = F.when(d % 2 == 0, F.lit("https")).otherwise(F.lit("http"))
    www = F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit(""))
    path = F.pmod(
        hash60(F.concat(d.cast("string"), F.lit("#upath"))),
        F.lit(SYNTH_PATH_BUCKETS),
    ).cast("string")
    slash = F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit(""))
    qs = F.when(
        d % 4 == 0,
        F.concat(F.lit("?utm_source=feed&cid="), d.cast("string")),
    ).otherwise(F.lit(""))
    frag = F.when(
        d % 7 == 0, F.concat(F.lit("#sec-"), (d % 9).cast("string"))
    ).otherwise(F.lit(""))
    return F.concat(
        sch, F.lit("://"), www, s, F.lit(".example.com/p/"), path,
        slash, qs, frag,
    )


#: the oracle-side mirror of :func:`synthetic_crawl_url` (DuckDB SQL,
#: term for term; {d} = doc_id expr, {s} = source expr)
SYNTH_URL_SQL = (
    "(CASE WHEN {d} % 2 = 0 THEN 'https' ELSE 'http' END || '://' || "
    "CASE WHEN {d} % 3 = 0 THEN 'www.' ELSE '' END || {s} || "
    "'.example.com/p/' || "
    "CAST(('0x' || substr(md5(CAST({d} AS VARCHAR) || '#upath'), 1, 15))"
    # single-sourced from SYNTH_PATH_BUCKETS so the mirror can't drift
    f"::BIGINT % {SYNTH_PATH_BUCKETS} AS VARCHAR) || "
    "CASE WHEN {d} % 5 = 0 THEN '/' ELSE '' END || "
    "CASE WHEN {d} % 4 = 0 THEN '?utm_source=feed&cid=' || "
    "CAST({d} AS VARCHAR) ELSE '' END || "
    "CASE WHEN {d} % 7 = 0 THEN '#sec-' || CAST({d} % 9 AS VARCHAR) "
    "ELSE '' END)"
)


def normalize_url(url: Column | str) -> Column:
    """Canonical URL: lowercase, strip ``http(s)://`` and a leading
    ``www.``, drop everything from the first ``?`` or ``#``
    (query/fragment), strip trailing slashes. Lowercasing runs FIRST so
    uppercase schemes/hosts ('HTTP://WWW.Example.com' — common in crawl
    metadata) canonicalize with everything else (r9 s5 review: with
    lower() applied last the case-sensitive scheme regex never fired on
    them). The regexes are in the Java-regex/RE2 common subset so
    DuckDB computes the identical canonical form."""
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(u), r"^https?://(www\.)?", ""),
            r"[?#].*$", "",
        ),
        r"/+$", "",
    )


#: the oracle-side mirror of :func:`normalize_url` ({u} = url expr)
NORMALIZE_URL_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(lower({u}), "
    "'^https?://(www\\.)?', ''), '[?#].*$', ''), '/+$', '')"
)


def url_host(url_norm: Column | str) -> Column:
    """Host of a NORMALIZED url (everything before the first '/')."""
    u = F.col(url_norm) if isinstance(url_norm, str) else url_norm
    return F.split(u, "/").getItem(0)
