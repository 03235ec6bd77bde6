"""Parity tests for reference_impl against the reference's own test expectations.

Expected values mirror the reference's unit suites
(arkham-shard-parse/tests/test_chunker.py, tests/test_extractors.py) plus
hand-derived fixtures for the functions the reference doesn't unit-test.
"""

from datetime import datetime

from arkhammirror_spark.reference_impl import (
    assess_quality,
    chunk_fixed,
    chunk_sentences,
    decode_text_bytes,
    detect_language,
    extract_claims,
    extract_iso_dates,
    extract_relations,
    extract_relative_dates,
    is_valid_entity,
    mock_ner,
    normalize_text,
    shannon_entropy,
    strip_html,
)


class TestChunkFixed:
    def test_small_text(self):
        chunks = chunk_fixed("Short text.", chunk_size=100, overlap=10)
        assert len(chunks) == 1
        assert chunks[0]["text"] == "Short text."
        assert chunks[0]["chunk_index"] == 0

    def test_exact_size(self):
        chunks = chunk_fixed("0123456789", chunk_size=10, overlap=0)
        assert [c["text"] for c in chunks] == ["0123456789"]

    def test_overlap(self):
        # reference test_chunker.py:58-72
        chunks = chunk_fixed("0123456789ABCDEFGHIJ", chunk_size=10, overlap=3)
        assert [c["text"] for c in chunks] == ["0123456789", "789ABCDEFG", "EFGHIJ"]

    def test_char_positions(self):
        chunks = chunk_fixed("0123456789ABCDEFGHIJ", chunk_size=10, overlap=0)
        assert (chunks[0]["char_start"], chunks[0]["char_end"]) == (0, 10)
        assert (chunks[1]["char_start"], chunks[1]["char_end"]) == (10, 20)

    def test_token_count(self):
        chunks = chunk_fixed("One two three four five.", chunk_size=100, overlap=50)
        assert chunks[0]["token_count"] == 5

    def test_zero_step_guard(self):
        chunks = chunk_fixed("abcd", chunk_size=2, overlap=5)
        assert [c["text"] for c in chunks] == ["ab", "bc", "cd", "d"]


class TestChunkSentences:
    def test_greedy_packing(self):
        text = "First sentence here. Second sentence here. Third one."
        chunks = chunk_sentences(text, chunk_size=45)
        assert [c["text"] for c in chunks] == [
            "First sentence here. Second sentence here.",
            "Third one.",
        ]
        assert chunks[0]["char_start"] == 0
        assert chunks[1]["char_start"] == len(chunks[0]["text"])

    def test_preserves_emails(self):
        text = "Email agent.smith@cia.gov arrived. Next sentence follows."
        chunks = chunk_sentences(text, chunk_size=500)
        assert chunks[0]["text"] == text

    def test_newline_boundary(self):
        text = "one ends here.\nlowercase next."
        chunks = chunk_sentences(text, chunk_size=14)
        assert [c["text"] for c in chunks] == ["one ends here.", "lowercase next."]


class TestMockNer:
    def test_reference_string(self):
        # reference test_extractors.py:42-53
        ents = mock_ner("John Smith works at Acme Corp in New York.")
        texts = [e["text"] for e in ents]
        assert "John Smith" in texts
        assert "Acme Corp" in texts
        assert "New York." in texts  # punctuation kept (split() words)

    def test_consecutive_capitals(self):
        texts = [e["text"] for e in mock_ner("John Smith met Jane Doe today")]
        assert "John Smith" in texts
        assert "Jane Doe" in texts

    def test_single_letter_continuation(self):
        # continuation words only need an uppercase first char (any length)
        texts = [e["text"] for e in mock_ner("met John A Smith there")]
        assert texts == ["John A Smith"]

    def test_single_letter_cannot_start(self):
        texts = [e["text"] for e in mock_ner("plan A Bravo failed")]
        assert texts == ["Bravo"]

    def test_confidence_and_offsets(self):
        ents = mock_ner("Apple announced products.")
        assert ents[0]["confidence"] == 0.5
        assert ents[0]["start_char"] == 0 and ents[0]["end_char"] == 0
        assert ents[0]["entity_type"] == "PERSON"


class TestNormalize:
    def test_smart_punctuation(self):
        out, changes = normalize_text("“Hello” — it’s fine…")
        assert out == '"Hello" -- it\'s fine...'
        assert "fixed_smart_punctuation" in changes

    def test_control_chars(self):
        out, changes = normalize_text("ab\x00cd\x07ef")
        assert out == "abcdef"
        assert "removed_control_chars" in changes

    def test_keeps_tabs_newlines(self):
        out, _ = normalize_text("a\tb\nc")
        assert out == "a\tb\nc"

    def test_nfkc(self):
        out, changes = normalize_text("ﬁle ｆｕｌｌ")  # ligature + full-width
        assert out == "file full"
        assert "normalized_unicode" in changes

    def test_whitespace_collapse(self):
        out, _ = normalize_text("a    b\n\n\n\n\nc\n  d  ")
        assert out == "a b\n\n\nc\nd"

    def test_no_changes(self):
        out, changes = normalize_text("plain text")
        assert out == "plain text"
        assert changes == ["no_changes_needed"]


class TestLanguage:
    def test_english(self):
        lang, conf = detect_language("The quick brown fox jumps over the lazy dog")
        assert lang == "en"
        assert conf >= 0.9

    def test_cyrillic(self):
        lang, _ = detect_language("Быстрая коричневая лиса прыгает через ленивую собаку")
        assert lang == "ru"

    def test_cjk(self):
        lang, _ = detect_language("敏捷的棕色狐狸跳过懒狗 快速移动")
        assert lang == "zh"

    def test_arabic(self):
        lang, _ = detect_language("الثعلب البني السريع يقفز فوق الكلب الكسول")
        assert lang == "ar"

    def test_empty(self):
        assert detect_language("12345 !!!") == ("unknown", 0.0)


class TestQuality:
    def test_empty(self):
        q = assess_quality("")
        assert q == {"score": 0.0, "issues": ["empty_text"], "word_count": 0, "char_count": 0}

    def test_good_text(self):
        q = assess_quality(
            "The committee published a detailed report covering quarterly "
            "financial results and operational highlights for the year."
        )
        assert q["issues"] == ["good_quality"]
        assert q["score"] == 1.0

    def test_repetitive(self):
        q = assess_quality("spam spam spam spam spam spam spam spam")
        assert "repetitive_words" in q["issues"]

    def test_mostly_numbers(self):
        q = assess_quality("123456 789012 345678 901234 567890 1234 5678")
        assert "mostly_numbers" in q["issues"]
        assert "low_letter_ratio" in q["issues"]

    def test_entropy(self):
        assert shannon_entropy("") == 0.0
        assert shannon_entropy("aaaa") == 0.0
        assert abs(shannon_entropy("abab") - 1.0) < 1e-12


class TestDates:
    def test_iso(self):
        out = extract_iso_dates("Meeting on 2024-01-15 and invalid 2024-13-45 skipped.")
        assert len(out) == 1
        assert out[0]["text"] == "2024-01-15"
        assert out[0]["normalized_date"] == datetime(2024, 1, 15)
        assert out[0]["confidence"] == 0.8
        assert (out[0]["start_char"], out[0]["end_char"]) == (11, 21)

    def test_relative(self):
        out = extract_relative_dates("We met yesterday and again last week, 3 days ago.")
        texts = [m["text"] for m in out]
        assert "yesterday" in texts
        assert "last week" in texts
        assert "3 days ago" in texts
        assert all(m["confidence"] == 0.7 for m in out)


class TestRelations:
    def test_zero_offset_cooccurrence(self):
        # mock-NER mentions carry 0/0 offsets → degenerate span branch
        text = "John Smith works at Acme Corp in New York."
        ments = mock_ner(text)
        rels = extract_relations(text, ments)
        assert len(rels) == 3  # all pairs of 3 mentions
        assert all(r["relation_type"] == "co_occurrence" for r in rels)
        assert all(r["confidence"] == 0.5 for r in rels)
        assert all(r["evidence"] == "Entities within 0 chars" for r in rels)

    def test_pattern_between_real_spans(self):
        text = "John Smith works for Acme Corp."
        ments = [
            {"text": "John Smith", "start_char": 0, "end_char": 10},
            {"text": "Acme Corp", "start_char": 21, "end_char": 30},
        ]
        rels = extract_relations(text, ments)
        assert rels[0]["relation_type"] == "employment"
        assert rels[0]["confidence"] == 0.75

    def test_distance_decay(self):
        text = "Alpha" + " x" * 40 + " Beta end"
        ments = [
            {"text": "Alpha", "start_char": 0, "end_char": 5},
            {"text": "Beta", "start_char": 86, "end_char": 90},
        ]
        rels = extract_relations(text, ments)
        assert rels[0]["relation_type"] == "co_occurrence"
        assert rels[0]["confidence"] == max(0.3, 0.5 - 81 / 500)


class TestEntityFilter:
    def test_garbage(self):
        for bad in ("24/7", "1st", "$100", "100$", "10:30", "1.5", "50%", "ab", "x", "42"):
            assert not is_valid_entity(bad, "PERSON"), bad

    def test_noise_words(self):
        for bad in ("The", "it", "January", "Monday", "Corp"):
            assert not is_valid_entity(bad, "PERSON"), bad

    def test_generic_single_word(self):
        assert not is_valid_entity("Company", "ORG")
        assert is_valid_entity("Company", "PRODUCT")  # generic gate only for P/O/G types

    def test_alpha_ratio(self):
        assert not is_valid_entity("a-1-2-3-4", "PERSON")
        assert is_valid_entity("Acme Corp", "ORG")
        assert is_valid_entity("John Smith", "PERSON")


class TestClaims:
    def test_filters(self):
        text = (
            "- a list item that should be skipped entirely now. "
            "The quarterly revenue grew by twelve percent. "
            "Too short here. "
            "Is this working as expected for everyone? "
            "The board approved the updated security policy yesterday."
        )
        claims = [c["text"] for c in extract_claims(text)]
        assert "The quarterly revenue grew by twelve percent." in claims
        assert "The board approved the updated security policy yesterday." in claims
        assert all(not c.endswith("?") for c in claims)
        assert all(not c.startswith("-") for c in claims)
        assert len(claims) == 2

    def test_cap_100(self):
        text = "This sentence has exactly six words. " * 250
        assert len(extract_claims(text)) == 100


class TestHtmlStrip:
    def test_strip(self):
        html = "<html><body><p>Hello <b>world</b></p>\n<div>again</div></body></html>"
        assert strip_html(html) == "Hello world again"

    def test_whitespace_collapse(self):
        assert strip_html("a  <br/>   b\n\nc") == "a b c"


class TestTextDecode:
    def test_utf8(self):
        text, lines = decode_text_bytes("héllo\nwörld".encode("utf-8"))
        assert text == "héllo\nwörld"
        assert lines == 2

    def test_fallback_latin1(self):
        raw = "caf\xe9s".encode("latin-1")  # invalid utf-8; odd length defeats utf-16
        text, _ = decode_text_bytes(raw)
        assert text == "cafés"

    def test_newline_translation(self):
        text, lines = decode_text_bytes(b"a\r\nb\rc")
        assert text == "a\nb\nc"
        assert lines == 3
