import pytest

from xjs import api
from xjs.errors import ValidationError


def test_validate_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "xx")], "id long, lang string"
    )
    res = api.validate(df, {"properties": {"lang": {"enum": ["en", "de"]}}}, id_col="id")
    assert not res.ok
    [v] = res.violations.collect()
    assert (v["id"], v["keyword"]) == (2, "enum")
    with pytest.raises(ValidationError):
        res.raise_on_failure()

    ok = api.validate(df.filter("id = 1"), {"properties": {"lang": {"enum": ["en"]}}}, id_col="id")
    assert ok.ok
    ok.raise_on_failure()


def test_check_document_matches_reference_shape():
    errs = api.check_document({"type": "string", "minLength": 3}, "ab")
    assert errs == [{"path": [], "keyword": "minLength", "value": 3}]
    assert api.check_document({}, {"anything": 1}) == []
