"""Pure-Python text pipeline core — the single source of truth for
extraction + tokenization + lemmatization semantics.

Both the pytest oracle (oracle.py) and the Spark vectorized UDFs
(functions/udfs.py) call these exact functions, so "byte-identical
extracted text per url" holds by construction.

Reference semantics mirrored:
- extract_text:  Jsoup.parse(html).text()  (services/LemmaSearch.java:68-70)
  * script/style/head/comment content removed
  * block-level tags contribute whitespace, inline tags contribute nothing
  * character entities decoded; U+00A0 (&#160;) treated as whitespace
  * whitespace collapsed to single spaces, trimmed
  golden: LemmaSearchTests.java:36-47 (entity-laden fragment, exact string)
- tokenize:      text.toLowerCase().replaceAll("([^а-я\\s])","")
                 .trim().split("\\s+")   (services/LemmaSearch.java:35-36)
- word_to_lemma: variant without \\s retention (LemmaSearch.java:72-79)
- split_to_lemmas: per-text lemma term frequencies, skipping function words
  and dictionary misses (LemmaSearch.java:33-56)
"""

from __future__ import annotations

import re
from collections import Counter
from html import unescape

from .lexicon import FUNCTION_POS, lexicon_dict

# --- HTML extraction --------------------------------------------------------

# Tags whose entire content is dropped (jsoup: not part of body text).
_DROP_CONTENT_RE = re.compile(
    r"(?is)<(script|style|head|noscript|template)\b[^>]*>.*?</\1\s*>"
)
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"<[^>]*>")
_TAG_NAME_RE = re.compile(r"^</?\s*([a-zA-Z0-9]+)")

# HTML block-level elements: a boundary contributes whitespace in
# Element.text(); inline elements (a, span, sup, b, i, ...) do not.
_BLOCK_TAGS = frozenset(
    """address article aside blockquote body br caption dd details div dl dt
    fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr html
    legend li main nav ol option p pre section select summary table tbody td
    tfoot th thead tr ul""".split()
)

# jsoup StringUtil.isActuallyWhitespace includes U+00A0; Python \s does not.
_WS_RE = re.compile(r"[\s\u00a0\u200b]+")

_TITLE_RE = re.compile(r"(?is)<title[^>]*>(.*?)</title>")


def _tag_repl(m: re.Match) -> str:
    name = _TAG_NAME_RE.match(m.group(0))
    if name and name.group(1).lower() in _BLOCK_TAGS:
        return " "
    return ""


def extract_text(html: str) -> str:
    """Plain text of an HTML document, Jsoup.parse(html).text() semantics."""
    s = _COMMENT_RE.sub(" ", html)
    s = _DROP_CONTENT_RE.sub(" ", s)
    s = _TAG_RE.sub(_tag_repl, s)
    s = unescape(s)
    return _WS_RE.sub(" ", s).strip()


def extract_title(html: str) -> str:
    """<title> content, extracted at index time (the reference re-fetches the
    live page per search hit — SearchServiceImpl.java:82-94 — a non-goal)."""
    m = _TITLE_RE.search(html)
    return _WS_RE.sub(" ", unescape(m.group(1))).strip() if m else ""


# --- Tokenization ------------------------------------------------------------

_NON_RU_KEEP_WS = re.compile(r"[^а-я\s]")
_NON_RU = re.compile(r"[^а-я]")


def tokenize(text: str) -> list[str]:
    """Reference tokenizer: lowercase, delete all chars outside [а-я\\s]
    (kills digits, Latin, 'ё', punctuation), split on whitespace runs."""
    cleaned = _NON_RU_KEEP_WS.sub("", text.lower()).strip()
    return [w for w in cleaned.split() if w]


def normalize_word(word: str) -> str:
    """Single-word normalization used by snippets (LemmaSearch.java:73)."""
    return _NON_RU.sub("", word.lower())


# --- Lemmatization -----------------------------------------------------------


def word_to_lemma(word: str, lex: dict[str, tuple[str, str]] | None = None) -> str:
    """First-normal-form lookup; '' when unknown (LemmaSearch.java:72-79).
    NB: does NOT drop function words — snippet matching keeps them."""
    lex = lex if lex is not None else lexicon_dict()
    entry = lex.get(normalize_word(word))
    return entry[0] if entry else ""


def lemmatize_tokens(tokens: list[str], lex: dict[str, tuple[str, str]] | None = None) -> list[str]:
    """Token stream -> lemma stream, dropping function words and unknowns
    (LemmaSearch.java:39-49)."""
    lex = lex if lex is not None else lexicon_dict()
    out: list[str] = []
    for w in tokens:
        entry = lex.get(w)
        if entry is None or entry[1] in FUNCTION_POS:
            continue
        out.append(entry[0])
    return out


def split_to_lemmas(text: str, lex: dict[str, tuple[str, str]] | None = None) -> dict[str, int]:
    """lemma -> tf for one text (LemmaSearch.splitToLemmas, :33-56)."""
    return dict(Counter(lemmatize_tokens(tokenize(text), lex)))


def is_function_word(word: str, lex: dict[str, tuple[str, str]] | None = None) -> bool:
    """LemmaSearch.isFunctionWords (:58-66); unknown words are not function
    words (the reference would raise; our corpus never hits that path)."""
    lex = lex if lex is not None else lexicon_dict()
    entry = lex.get(word)
    return entry is not None and entry[1] in FUNCTION_POS


# --- Query validation ---------------------------------------------------------

_QUERY_OK_RE = re.compile(r"[А-Яа-яёЁ\d\s!-/:-@\[-`{-~]+\Z")


def is_query_valid(query: str) -> bool:
    """Russian-charset validation (SearchServiceImpl.java:77-80): the query
    must consist of Cyrillic letters, digits, whitespace and punctuation."""
    return bool(query) and bool(_QUERY_OK_RE.match(query))
