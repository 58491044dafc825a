"""CoNLL ingest converter: line-oriented tagged text → transcript-shaped docs.

Engine analog of the reference's ZELDA prep script (``scripts/zelda.py``):

- line format ``word<TAB>tag[<TAB>link]`` with ``-DOCSTART-`` document breaks
  (``scripts/zelda.py:19-55`` S3),
- B/I/O span decoding INCLUDING the label-change-without-B edge case — a tag
  switching from ``I-x`` to ``I-y`` with no ``B-`` starts a new span
  (``scripts/zelda.py:81-104`` M7),
- word → char offset building: words joined by single spaces, per-word
  ``(start, end)`` char positions (``scripts/zelda.py:66-78`` M8),
- assembled example rows ``{text, entities:[{start,end,label,title}]}``
  (``scripts/zelda.py:57-63`` M9).

This is an ingest-side converter (``read_text`` + per-file stateful parse),
not a hot-path operator: documents become rows of the engine's transcript
shape (one conversation per document, one turn per sentence), and the decoded
spans become a ``mentions_from_annotations``-compatible span table.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["parse_conll", "conll_to_tables", "decode_bio_spans", "word_char_offsets"]


def decode_bio_spans(tags: list[str], links: list[str]) -> list[tuple[int, int, str, str]]:
    """BIO tags → token spans ``(start_tok, end_tok_exclusive, label, link)``.

    Mirrors the reference's state machine (``zelda.py:81-104``): ``B-`` always
    opens; ``I-`` continues only when the label matches the open span —
    otherwise it OPENS a new span (label-change-without-B); ``O`` closes.

    Link columns in ZELDA CoNLL files are BIO-prefixed like the tag
    (``B-<id>``/``I-<id>``) and the reference strips the prefix
    unconditionally (``zelda.py:91-92`` ``cur_link = link_tag[2:]``); we strip
    it when present so un-prefixed link columns keep working too.
    """
    spans: list[tuple[int, int, str, str]] = []
    open_start, open_label, open_link = None, None, None
    for i, (tag, link) in enumerate(zip(tags, links)):
        if tag == "O" or tag == "":
            if open_start is not None:
                spans.append((open_start, i, open_label, open_link))
                open_start = None
            continue
        prefix, _, label = tag.partition("-")
        if prefix == "B" or open_start is None or label != open_label:
            if open_start is not None:
                spans.append((open_start, i, open_label, open_link))
            open_start, open_label = i, label
            open_link = link[2:] if link[:2] in ("B-", "I-") else link
    if open_start is not None:
        spans.append((open_start, len(tags), open_label, open_link))
    return spans


def word_char_offsets(words: list[str]) -> tuple[str, list[tuple[int, int]]]:
    """Words → single-space-joined text + per-word char ``(start, end)``
    (reference ``zelda.py:66-78``)."""
    text_parts: list[str] = []
    offsets: list[tuple[int, int]] = []
    pos = 0
    for w in words:
        offsets.append((pos, pos + len(w)))
        text_parts.append(w)
        pos += len(w) + 1
    return " ".join(text_parts), offsets


def parse_conll(lines: list[str]) -> list[dict]:
    """CoNLL lines → list of documents ``{words, tags, links, sentences}``.

    ``-DOCSTART-`` breaks documents; blank lines break sentences.
    """
    docs: list[dict] = []
    cur_sentences: list[list[tuple[str, str, str]]] = []
    cur: list[tuple[str, str, str]] = []

    def flush_sentence():
        nonlocal cur
        if cur:
            cur_sentences.append(cur)
            cur = []

    def flush_doc():
        nonlocal cur_sentences
        flush_sentence()
        if cur_sentences:
            docs.append({"sentences": cur_sentences})
            cur_sentences = []

    for raw in lines:
        line = raw.rstrip("\n")
        if line.startswith("-DOCSTART-"):
            flush_doc()
            continue
        if not line.strip():
            flush_sentence()
            continue
        parts = line.split("\t")
        word = parts[0]
        tag = parts[1] if len(parts) > 1 else "O"
        link = parts[2] if len(parts) > 2 else ""
        cur.append((word, tag, link))
    flush_doc()
    return docs


def conll_to_tables(lines: list[str], conv_prefix: str = "conll") -> tuple[pa.Table, pa.Table]:
    """CoNLL text → (transcripts-shaped table, span table).

    One conversation per document, one turn per sentence (role="user",
    tool="", ts = doc·1000 + sentence).  Spans carry char offsets into the
    turn text plus the link id as ``gold_id``.
    """
    t_conv, t_turn, t_role, t_text, t_tool, t_ts = [], [], [], [], [], []
    s_conv, s_turn, s_start, s_end, s_label, s_gold = [], [], [], [], [], []

    for di, doc in enumerate(parse_conll(lines)):
        conv_id = f"{conv_prefix}-{di:06d}"
        for si, sentence in enumerate(doc["sentences"]):
            words = [w for w, _, _ in sentence]
            tags = [t for _, t, _ in sentence]
            links = [l for _, _, l in sentence]
            text, offsets = word_char_offsets(words)
            t_conv.append(conv_id)
            t_turn.append(si)
            t_role.append("user")
            t_text.append(text)
            t_tool.append("")
            t_ts.append(di * 1000 + si)
            for tok_s, tok_e, label, link in decode_bio_spans(tags, links):
                s_conv.append(conv_id)
                s_turn.append(si)
                s_start.append(offsets[tok_s][0])
                s_end.append(offsets[tok_e - 1][1])
                s_label.append(label)
                s_gold.append(link)

    transcripts = pa.table(
        {
            "conv_id": pa.array(t_conv, pa.string()),
            "turn_idx": pa.array(t_turn, pa.int32()),
            "role": pa.array(t_role, pa.string()),
            "text": pa.array(t_text, pa.string()),
            "tool": pa.array(t_tool, pa.string()),
            "ts": pa.array(t_ts, pa.timestamp("us")),
        }
    )
    spans = pa.table(
        {
            "conv_id": pa.array(s_conv, pa.string()),
            "turn_idx": pa.array(s_turn, pa.int32()),
            "start": pa.array(s_start, pa.int32()),
            "end": pa.array(s_end, pa.int32()),
            "label": pa.array(s_label, pa.string()),
            "gold_id": pa.array(s_gold, pa.string()),
        }
    )
    return transcripts, spans
