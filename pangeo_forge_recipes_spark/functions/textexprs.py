"""Dialect-templated scalar expressions for text analysis.

The same logical expression renders to Spark SQL and to DuckDB SQL; the
few syntactic differences (regex flags, list vs array function names) are
isolated in the ``_DIALECT`` table. Everything stays JVM-side in Spark
(built-in functions, whole-stage codegen) — no Python UDFs in these paths.
"""

from __future__ import annotations

import re

from typing import Dict

# dialect-specific spellings
_DIALECT: Dict[str, Dict[str, str]] = {
    "spark": {
        "split_ws": "split({col}, ' ')",
        "arr_len": "size({x})",
        "arr_filter": "filter({x}, {lam})",
        "arr_transform": "transform({x}, {lam})",
        "arr_min": "array_min({x})",
        "seq": "sequence({a}, {b})",  # inclusive
        "regex_strip": "regexp_replace({col}, '{pat}', '')",
        "replace": "replace({col}, '{find}', '')",
        "md5": "md5({x})",
        "lower": "lower({x})",
        "substr": "substring({col}, {i}, {n})",
        "least": "least({a}, {b})",
        "greatest": "greatest({a}, {b})",
        "dbl": "cast({x} as double)",
        "str": "cast({x} as string)",
        "instr": "instr({s}, {x})",
        "arr_get": "element_at({x}, {i})",  # 1-based
        "arr1": "array({x})",  # single-element array (bind-once trick)
        "explode": "explode({x})",
        "quantile": "percentile({x}, {q})",  # exact, linear interpolation
    },
    "duckdb": {
        "split_ws": "string_split({col}, ' ')",
        "arr_len": "len({x})",
        "arr_filter": "list_filter({x}, {lam})",
        "arr_transform": "list_transform({x}, {lam})",
        "arr_min": "list_min({x})",
        "seq": "range({a}, ({b}) + 1)",  # range is [a, b) → +1 for inclusive
        "regex_strip": "regexp_replace({col}, '{pat}', '', 'g')",
        "replace": "replace({col}, '{find}', '')",
        "md5": "md5({x})",
        "lower": "lower({x})",
        "substr": "substr({col}, {i}, {n})",
        "least": "least({a}, {b})",
        "greatest": "greatest({a}, {b})",
        "dbl": "cast({x} as double)",
        "str": "cast({x} as varchar)",
        "instr": "instr({s}, {x})",
        "arr_get": "list_extract({x}, {i})",  # 1-based
        "arr1": "[{x}]",  # single-element list (bind-once trick)
        "explode": "unnest({x})",
        "quantile": "quantile_cont({x}, {q})",  # exact, linear interpolation
    },
}

_STOPWORDS = ("'the'", "'a'", "'an'", "'and'", "'of'", "'to'", "'in'", "'is'")

# per-language marker words for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": ("'the'", "'and'", "'of'"),
    "de": ("'der'", "'und'", "'die'"),
    "fr": ("'le'", "'et'", "'la'"),
    "es": ("'el'", "'y'", "'de'"),
    "zh": ("'de'", "'shi'", "'le'"),
}


def render(template: str, dialect: str, **kw) -> str:
    d = _DIALECT[dialect]

    def fmt(name: str, **inner) -> str:
        return d[name].format(**inner)

    return template.format(f=fmt, **kw)


class TextExprs:
    """Render text-metric expressions for one dialect. All expressions
    operate on a column named ``{col}`` (default ``text``).

    ``tokens_col`` (optional) names a column already holding the split
    token array: expressions then reference it instead of re-rendering
    ``split(col, ' ')`` — bind the array ONCE via ``withColumn`` when a
    query evaluates several token metrics per row, instead of paying
    the split per metric."""

    def __init__(self, dialect: str, col: str = "text", tokens_col: str | None = None):
        self.d = _DIALECT[dialect]
        self.col = col
        self.tokens_col = tokens_col

    def _f(self, name: str, **kw) -> str:
        # fast path: stripping a SINGLE literal character needs no regex
        # engine — plain replace() is one scan with no NFA, and Spark's
        # interpreted regexp_replace showed up in the gopher profile.
        # Identical semantics for a one-char class of a non-meta char.
        if (
            name == "regex_strip"
            and "replace" in self.d
            and re.fullmatch(r"\[([^\\\]^])\]", kw.get("pat", ""))
        ):
            return self.d["replace"].format(
                col=kw["col"], find=kw["pat"][1:-1]
            )
        return self.d[name].format(**kw)

    # -- tokens ---------------------------------------------------------------
    def tokens(self) -> str:
        if self.tokens_col is not None:
            return self.tokens_col
        return self._f("split_ws", col=self.col)

    def token_count(self) -> str:
        """Whitespace token count (SURVEY extension: token counting)."""
        return self._f("arr_len", x=self.tokens())

    def bpe_ish_token_count(self) -> str:
        """BPE-ish proxy: ceil(chars-without-spaces / 4) + punctuation count
        — the standard ~4-chars-per-token heuristic, exact integer math."""
        stripped = self._f("regex_strip", col=self.col, pat=r"[ ]")
        chars = f"length({stripped})"
        punct = self.punct_count()
        return f"(cast(ceil({chars} / 4.0) as bigint) + {punct})"

    # -- quality --------------------------------------------------------------
    def punct_count(self) -> str:
        no_punct = self._f("regex_strip", col=self.col, pat=r"[.,;:!?]")
        return f"(length({self.col}) - length({no_punct}))"

    def stopword_count(self) -> str:
        lam = "x -> x in ({})".format(", ".join(_STOPWORDS))
        return self._f(
            "arr_len", x=self._f("arr_filter", x=self.tokens(), lam=lam)
        )

    def stopword_ratio(self) -> str:
        n = self.token_count()
        return "({sw} / {f_dbl})".format(
            sw=self._f("dbl", x=self.stopword_count()),
            f_dbl=self._f("dbl", x=self._f("greatest", a=n, b="1")),
        )

    def punct_ratio(self) -> str:
        return "({p} / {n})".format(
            p=self._f("dbl", x=self.punct_count()),
            n=self._f("dbl", x=f"{self._f('greatest', a=f'length({self.col})', b='1')}"),
        )

    def mean_word_len(self) -> str:
        # chars-without-spaces = length - (token_count - 1): a single-char
        # split always yields nsep+1 fields, so the space count IS
        # token_count - 1 — no second string scan (gopher profile: the
        # strip pass was measurable at corpus width)
        chars = f"(length({self.col}) - ({self.token_count()} - 1))"
        return "({c} / {n})".format(
            c=self._f("dbl", x=chars),
            n=self._f("dbl", x=self._f("greatest", a=self.token_count(), b="1")),
        )

    def quality_score(self) -> str:
        """Deterministic [0,1] quality heuristic: length sufficiency +
        low punctuation + stopword presence + sane word length. Pure
        IEEE-double arithmetic → bit-identical across engines."""
        len_term = self._f(
            "least", a=f"({self._f('dbl', x=self.token_count())} / 64.0)", b="1.0"
        )
        word_term = (
            f"(1.0 - {self._f('least', a=f'abs({self.mean_word_len()} - 5.0) / 5.0', b='1.0')})"
        )
        return (
            f"(0.35 * {len_term} + 0.25 * (1.0 - {self.punct_ratio()}) "
            f"+ 0.2 * {self.stopword_ratio()} + 0.2 * {word_term})"
        )

    # -- language id ----------------------------------------------------------
    def lang_scores(self) -> Dict[str, str]:
        out = {}
        for lang, markers in _LANG_MARKERS.items():
            lam = "x -> x in ({})".format(", ".join(markers))
            out[lang] = self._f(
                "arr_len", x=self._f("arr_filter", x=self.tokens(), lam=lam)
            )
        return out

    def lang_id(self) -> str:
        """Argmax over marker-word hit counts; deterministic tie-break by
        language priority order (en, de, es, fr, zh): the first language in
        order whose score equals the max wins. Sequential CASE encodes it
        identically in both dialects."""
        scores = self.lang_scores()
        ordered = ["en", "de", "es", "fr", "zh"]
        branches = []
        for lang in ordered:
            s = scores[lang]
            geq = " and ".join(
                [f"{s} >= {scores[o]}" for o in ordered if o != lang] + [f"{s} >= 1"]
            )
            branches.append(f"when {geq} then '{lang}'")
        return "(case " + " ".join(branches) + " else 'und' end)"

    # -- deterministic sampling -----------------------------------------------
    def sample_bucket(self, id_expr: str, buckets: int = 100) -> str:
        """Deterministic [0, buckets) bucket from the md5 of ``id_expr`` —
        the portable train/val/test splitter: same value in every engine,
        stable across runs and repartitionings (unlike ``rand()``), and
        uniform because it parses the first 3 hex digits (0..4095) rather
        than taking ASCII codes of hex characters."""
        h = self._f("md5", x=id_expr)
        parts = []
        for pos, w in ((1, 256), (2, 16), (3, 1)):
            c = self._f("substr", col=h, i=str(pos), n="1")
            hexpos = self._f("instr", s="'0123456789abcdef'", x=c)
            parts.append(f"(({hexpos} - 1) * {w})")
        return f"(({' + '.join(parts)}) % {buckets})"

    def split_label(self, id_expr: str, train: int = 90, val: int = 5) -> str:
        """'train' / 'val' / 'test' label from the deterministic bucket
        (``train`` and ``val`` are percentages; the rest is test)."""
        b = self.sample_bucket(id_expr, 100)
        return (
            f"(case when {b} < {train} then 'train' "
            f"when {b} < {train + val} then 'val' else 'test' end)"
        )

    # -- n-grams over tokens --------------------------------------------------
    def token_ngrams(self, n: int = 2) -> str:
        """Array of space-joined token ``n``-grams; empty for docs shorter
        than ``n`` tokens. The filter guard keeps every index strictly in
        range, so the expression is safe under Spark's ANSI
        ``element_at``.

        The token array is bound ONCE via a single-element-array
        ``transform`` whose lambda variable ``t`` carries it into the
        nested lambdas — inlining the tokenize expression inside the
        per-element ``element_at`` would re-split the text per n-gram,
        O(tokens²) per document."""
        cnt = self._f("arr_len", x="t")
        seq = self._f(
            "seq", a="1", b=self._f("greatest", a=f"({cnt} - {n - 1})", b="1")
        )
        in_range = self._f(
            "arr_filter", x=seq, lam=f"i -> i <= ({cnt} - {n - 1})"
        )
        parts = []
        for j in range(n):
            i = "i" if j == 0 else f"(i + {j})"
            parts.append(self._f("arr_get", x="t", i=i))
        joined = parts[0]
        for p in parts[1:]:
            joined = f"concat({joined}, ' ', {p})"
        body = self._f("arr_transform", x=in_range, lam=f"i -> {joined}")
        once = self._f(
            "arr_transform",
            x=self._f("arr1", x=self.tokens()),
            lam=f"t -> {body}",
        )
        return self._f("arr_get", x=once, i="1")

    def token_bigrams(self) -> str:
        """Array of space-joined token bigrams; empty for one-token docs."""
        return self.token_ngrams(2)

    # -- quantiles ------------------------------------------------------------
    def quantile(self, x: str, q: str) -> str:
        """Exact linear-interpolation quantile (Spark ``percentile`` /
        DuckDB ``quantile_cont`` — same definition, matching values). The
        scale path is ``approx_percentile``; the oracle pins the exact one."""
        return self._f("quantile", x=x, q=q)

    # -- fingerprinting -------------------------------------------------------
    def fingerprint_md5(self) -> str:
        """Whole-document fingerprint: md5 of the lowercased text."""
        return self._f("md5", x=self._f("lower", x=self.col))

    def char_ngrams(self, n: int = 5) -> str:
        upper = self._f("greatest", a=f"(length({self.col}) - {n - 1})", b="1")
        seq = self._f("seq", a="1", b=upper)
        lam = "i -> " + self._f("substr", col=self.col, i="i", n=str(n))
        return self._f("arr_transform", x=seq, lam=lam)

    def rolling_min_hash(self, n: int = 5) -> str:
        """Winnowing-style rolling fingerprint: min md5 over all character
        ``n``-grams — a 1-permutation minhash, SQL-expressible in both
        dialects."""
        lam = "g -> " + self._f("md5", x="g")
        hashed = self._f("arr_transform", x=self.char_ngrams(n), lam=lam)
        return self._f("arr_min", x=hashed)
