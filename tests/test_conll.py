"""CoNLL ingest converter tests, incl. the reference's B/I/O edge cases."""

import pyarrow as pa

from mix_blink_ray.sources.conll import conll_to_tables, decode_bio_spans, parse_conll, word_char_offsets
from mix_blink_ray.stages.mentions import mentions_from_annotations


def test_decode_bio_basic():
    tags = ["B-ORG", "I-ORG", "O", "B-PER"]
    links = ["acme", "acme", "", "bob"]
    assert decode_bio_spans(tags, links) == [(0, 2, "ORG", "acme"), (3, 4, "PER", "bob")]


def test_decode_bio_label_change_without_B():
    """I-x followed by I-y (no B) must START a new span — the reference's
    explicit edge case (zelda.py:81-104)."""
    tags = ["I-ORG", "I-ORG", "I-PER"]
    links = ["acme", "acme", "bob"]
    assert decode_bio_spans(tags, links) == [(0, 2, "ORG", "acme"), (2, 3, "PER", "bob")]


def test_decode_bio_span_at_end():
    assert decode_bio_spans(["O", "B-LOC"], ["", "paris"]) == [(1, 2, "LOC", "paris")]


def test_word_char_offsets():
    text, offs = word_char_offsets(["New", "York", "City"])
    assert text == "New York City"
    assert offs == [(0, 3), (4, 8), (9, 13)]
    assert text[offs[1][0] : offs[2][1]] == "York City"


CONLL = """-DOCSTART-
The\tO
Acme\tB-ORG\tacme_corp
Corp\tI-ORG\tacme_corp
hired\tO
Bob\tB-PER\tbob_smith

Second\tO
sentence\tO
-DOCSTART-
Paris\tB-LOC\tparis_fr
calling\tO
"""


def test_parse_and_convert():
    lines = CONLL.splitlines()
    docs = parse_conll(lines)
    assert len(docs) == 2
    assert len(docs[0]["sentences"]) == 2

    transcripts, spans = conll_to_tables(lines)
    assert transcripts.num_rows == 3  # 2 sentences + 1
    assert transcripts.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert transcripts["text"][0].as_py() == "The Acme Corp hired Bob"
    sp = spans.to_pylist()
    assert len(sp) == 3
    first = sp[0]
    text = transcripts["text"][0].as_py()
    assert text[first["start"] : first["end"]] == "Acme Corp"
    assert first["gold_id"] == "acme_corp"

    # spans feed the engine's annotation-based mention source
    mentions = mentions_from_annotations(transcripts, spans)
    assert mentions["surface"].to_pylist() == ["Acme Corp", "Bob", "Paris"]


def test_zelda_style_bio_prefixed_links():
    """ZELDA CoNLL link columns carry the BIO prefix too (reference
    zelda.py:92 ``cur_link = link_tag[2:]``) — the converter must strip it."""
    lines = [
        "Acme\tB-ORG\tB-acme_corp",
        "Corp\tI-ORG\tI-acme_corp",
        "and\tO",
        "Globex\tB-ORG\tB-globex_inc",
    ]
    spans = decode_bio_spans(
        [l.split("\t")[1] if len(l.split("\t")) > 1 else "O" for l in lines],
        [l.split("\t")[2] if len(l.split("\t")) > 2 else "" for l in lines],
    )
    assert spans == [(0, 2, "ORG", "acme_corp"), (3, 4, "ORG", "globex_inc")]

    _, span_tbl = conll_to_tables(lines)
    assert span_tbl["gold_id"].to_pylist() == ["acme_corp", "globex_inc"]
