import numpy as np

from qdrant_tpu.storage.segment import Segment
from qdrant_tpu.types import (
    CollectionParams,
    Distance,
    PayloadIndexParams,
    PayloadSchemaType,
    VectorParams,
    parse_filter,
)
from qdrant_tpu.utils.text import porter_stem


def make_segment(**text_params):
    params = CollectionParams(
        vectors={"": VectorParams(size=4, distance=Distance.DOT)}
    )
    seg = Segment(params)
    docs = [
        "The quick brown fox jumps over the lazy dog",
        "Running runners ran quickly through the fields",
        "Databases store documents with vectors and payloads",
        "поисковые системы используют векторы",
    ]
    for i, doc in enumerate(docs):
        seg.upsert_point(i + 1, i, {"": np.zeros(4, dtype=np.float32)}, {"body": doc})
    seg.create_field_index(
        "body",
        PayloadIndexParams(type=PayloadSchemaType.TEXT, **text_params),
    )
    return seg


def mask_for(seg, query):
    flt = parse_filter({"must": [{"key": "body", "match": {"text": query}}]})
    return set(int(i) for i in seg.filter_mask(flt).nonzero()[0])


def test_porter_stem_basics():
    assert porter_stem("running") == porter_stem("runs") == porter_stem("run")
    assert porter_stem("relational") == porter_stem("relate")
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"


def test_text_match_basic():
    seg = make_segment()
    assert mask_for(seg, "quick fox") == {0}
    assert mask_for(seg, "vectors") == {2}
    # russian tokens are indexed by the unicode word tokenizer
    assert mask_for(seg, "векторы") == {3}


def test_stopwords_filtering():
    seg = make_segment(stopwords="english")
    # "the" is a stopword → text query of only stopwords matches everything
    flt = parse_filter({"must": [{"key": "body", "match": {"text": "the"}}]})
    mask = seg.filter_mask(flt)
    assert mask.sum() >= 4


def test_stemmer_matches_inflections():
    seg = make_segment(stemmer="porter")
    assert 1 in mask_for(seg, "run")       # "running", "runners", "ran"→ran
    assert 1 in mask_for(seg, "runner")
    assert 2 in mask_for(seg, "database")  # "databases" stemmed


def test_phrase_match():
    seg = make_segment()
    flt = parse_filter({"must": [{"key": "body", "match": {"phrase": "quick brown fox"}}]})
    assert set(seg.filter_mask(flt).nonzero()[0]) == {0}
    flt2 = parse_filter({"must": [{"key": "body", "match": {"phrase": "brown quick fox"}}]})
    assert set(seg.filter_mask(flt2).nonzero()[0]) == set()


def test_japanese_script_class_segmentation():
    """Dictionary-less Japanese segmentation (reference: tokenizers/
    japanese.rs): script-class boundaries split kanji/kana, katakana
    loanwords stay whole, short hiragana runs stay whole."""
    from qdrant_tpu.utils.text import segment_multilingual

    toks = segment_multilingual("東京で働くコンピュータ技術者")
    assert "コンピュータ" in toks      # katakana loanword: one token
    assert "東京" in toks              # kanji bigram
    assert "で" in toks                # particle survives as its own token
    # no token spans a kanji|kana boundary
    assert all(
        len({("hira" if 0x3040 <= ord(c) <= 0x309F else
              "kata" if 0x30A0 <= ord(c) <= 0x30FF else "han")
             for c in t}) == 1
        for t in toks
    )

    # text + phrase match through the index path stays consistent
    import numpy as np

    seg = make_segment(tokenizer="multilingual")
    seg.upsert_point(
        100, 100, {"": np.zeros(4, dtype=np.float32)},
        {"body": "東京で働くコンピュータ技術者"},
    )
    offs = mask_for(seg, "コンピュータ")
    assert len(offs) == 1
    flt = parse_filter(
        {"must": [{"key": "body", "match": {"phrase": "東京で働く"}}]}
    )
    assert set(seg.filter_mask(flt).nonzero()[0]) == offs
