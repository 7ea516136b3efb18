"""Golden ports of the reference's JUnit suite
(src/test/java/searchengine/services/LemmaSearchTests.java) — same inputs,
same expected outputs. These pin the semantics of extract/tokenize/lemmatize.
"""

from searchengine_spark.functions.text_core import (
    extract_text,
    extract_title,
    is_function_word,
    is_query_valid,
    split_to_lemmas,
    tokenize,
    word_to_lemma,
)


def test_split_to_lemmas_golden():
    # LemmaSearchTests.testSplitToLemmas (:15-24)
    text = "появление леопарда в Осетии позволяет предположить, что леопард обитает"
    lemmas = split_to_lemmas(text)
    assert len(lemmas) == 6
    for key in ("появление", "осетия", "позволять", "предположить", "обитать"):
        assert key in lemmas, key
    assert lemmas["леопард"] == 2


def test_is_function_words_golden():
    # LemmaSearchTests.testIsFunctionWords (:26-33)
    for word in ("или", "над", "под", "ох", "и", "ой"):
        assert is_function_word(word), word


def test_clear_code_from_tags_golden():
    # LemmaSearchTests.testClearCodeFromTags (:35-47) — byte-identical.
    content = (
        "<ul><li>Междометие&#160;— это разнородный по составу синтаксический класс, стоящий вне "
        'деления слов по <a href="/wiki/%D0%A7%D0%B0%D1%81%D1%82%D0%B8_%D1%80%D0%B5%D1%87%D0%B8_%D0%B2_'
        '%D1%80%D1%83%D1%81%D1%81%D0%BA%D0%BE%D0%BC_%D1%8F%D0%B7%D1%8B%D0%BA%D0%B5" title="Части речи '
        'в русском языке">частям</a> речи.</li>\n<li>Междометия входят в систему частей речи, но стоят в'
        ' ней изолированно<sup id="cite_ref-2" class="reference"><a href="#cite_note-2"><span class="'
        'cite-bracket">&#91;</span>2<span class="cite-bracket">&#93;</span></a></sup>.</li>'
    )
    text = (
        "Междометие — это разнородный по составу синтаксический класс, стоящий вне деления слов по "
        "частям речи. Междометия входят в систему частей речи, но стоят в ней изолированно[2]."
    )
    assert extract_text(content) == text


def test_word_to_lemma_string_golden():
    # LemmaSearchTests.testWordToLemmaString (:49-57)
    words = ["повторное", "обитает", "районам", "северного"]
    lemmas = ["повторный", "обитать", "район", "северный"]
    for w, l in zip(words, lemmas):
        assert word_to_lemma(w) == l


def test_indexing_tests_sentence():
    # IndexingServiceImplTests.java:186 — 8 lemmas after dropping "да" (СОЮЗ)
    lemmas = split_to_lemmas("Съешь еще этих мягких французских булок да выпей чаю")
    assert len(lemmas) == 8
    assert set(lemmas) == {
        "съесть", "еще", "этот", "мягкий", "французский", "булка", "выпить", "чай",
    }


def test_tokenizer_charset_rules():
    # [^а-я\s] deletion: digits, Latin, 'ё', punctuation all vanish
    # (LemmaSearch.java:35-36)
    assert tokenize("Ёж 123 hello мир!") == ["ж", "мир"]
    assert tokenize("") == []
    assert tokenize("   ") == []
    assert tokenize("abc 42 %") == []


def test_extract_title_and_scripts():
    html = (
        "<html><head><title>Заголовок &#160;страницы</title>"
        "<script>var x = '<li>junk</li>';</script></head>"
        "<body><p>Привет<!-- скрыто --> мир</p></body></html>"
    )
    assert extract_title(html) == "Заголовок страницы"
    assert extract_text(html) == "Привет мир"


def test_query_validation():
    # SearchServiceImpl.isQueryCorrect (:77-80)
    assert is_query_valid("красная площадь, 1905!")
    assert is_query_valid("ёжик Ё")
    assert not is_query_valid("red square")
    assert not is_query_valid("")


def test_tokens_sql_path_equals_python_path(spark, fixture_pages):
    """The all-Catalyst tokenize+lemmatize (broadcast lexicon join) must
    emit exactly the rows of the vectorized-Python path — same (doc_id,
    term, tf, dl) multiset — on the fixture corpus plus edge-case docs."""
    from searchengine_spark.functions.udfs import (tokens_from_docs,
                                                   tokens_from_docs_sql)

    rows = [(i, p["text"]) for i, p in enumerate(fixture_pages[:80])]
    rows += [
        (1001, ""),                             # empty text
        (1002, "   "),                          # whitespace only
        (1003, "ёжик 123 hello, мир!"),         # ё/latin/digits all killed
        (1004, "и или над под ох ой"),          # function words only
        (1005, "ЛЕОПАРДА  ЛеОпАрД в осетии"),   # case + double space
        (1006, "неизвестноеслово леопард"),     # unknown word skipped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    py = sorted(map(tuple, tokens_from_docs(docs).collect()))
    sql = sorted(map(tuple, tokens_from_docs_sql(docs).collect()))
    assert py == sql
    assert any(r[1] == "леопард" for r in sql)


def test_tokens_sql_plan_is_broadcast_join(spark):
    """The lemmatize join must plan as a broadcast hash join (the lexicon
    is ~10k rows) — a shuffle join here would be a scale bug."""
    from searchengine_spark.functions.udfs import tokens_from_docs_sql

    docs = spark.createDataFrame([(1, "леопард обитает")],
                                 "doc_id long, text string")
    plan = tokens_from_docs_sql(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
