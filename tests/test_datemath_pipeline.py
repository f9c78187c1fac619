"""Date math (datemath.py) + search-pipeline collapse/rename processors."""

import datetime as dt

import numpy as np
import pytest

from opensearch_ray.datemath import date_math_us, parse_date_math


def test_date_math_absolute_anchor():
    assert parse_date_math("2024-01-03||+1w/d") == dt.datetime(2024, 1, 10)
    assert parse_date_math("2024-01-03||+2w/d", round_up=True) == \
        dt.datetime(2024, 1, 17, 23, 59, 59, 999999)
    assert parse_date_math("2024-03-15T10:20:30||-90m/h") == \
        dt.datetime(2024, 3, 15, 8, 0, 0)
    assert parse_date_math("2024-03-15||/M", round_up=True) == \
        dt.datetime(2024, 3, 31, 23, 59, 59, 999999)


def test_date_math_now_and_calendar_units():
    now = dt.datetime(2024, 3, 15, 13, 45)
    assert parse_date_math("now-7d/d", now=now) == dt.datetime(2024, 3, 8)
    assert parse_date_math("now/w", now=now) == dt.datetime(2024, 3, 11)
    # calendar-aware month/year arithmetic with day clamping
    assert parse_date_math("2024-01-31||+1M") == dt.datetime(2024, 2, 29)
    assert parse_date_math("2024-02-29||+1y") == dt.datetime(2025, 2, 28)
    with pytest.raises(ValueError):
        parse_date_math("now+1d")  # now without explicit now=
    with pytest.raises(ValueError):
        parse_date_math("2024-01-01||+1x")  # junk unit fragment


def test_date_math_us_epoch():
    assert date_math_us("1970-01-01||+1d") == 86400 * 1_000_000


def test_spec_mask_date_math():
    from opensearch_ray.search.searcher import Searcher
    vals = np.array(["2024-01-09", "2024-01-10", "2024-01-17",
                     "2024-01-18"], dtype="datetime64[us]")
    m = Searcher._spec_mask(vals, {"gte": "2024-01-03||+1w/d",
                                   "lte": "2024-01-03||+2w/d"})
    assert m.tolist() == [False, True, True, False]
    # lte rounds UP: end-of-day Jan 17 included
    m2 = Searcher._spec_mask(
        np.array(["2024-01-17T23:59:59"], dtype="datetime64[us]"),
        {"lte": "2024-01-03||+2w/d"})
    assert m2.tolist() == [True]


def test_collapse_and_rename_processors(built_index):
    from opensearch_ray.search import Searcher
    from opensearch_ray.search.pipeline import (SearchPipeline,
                                                collapse_response,
                                                rename_field)
    s = Searcher(built_index.index_dir)
    # find a term with enough hits
    vocab = s._vocab().to_pandas().sort_values("df")
    term = str(vocab.iloc[-1].term)
    pipe = SearchPipeline(
        response_processors=[collapse_response(s, "role")])
    hits = pipe.search(s, term, k=50)
    roles = s.fetch([h.docid for h in hits], columns=["role"])
    assert len(set(roles.column("role").to_pylist())) == len(hits)
    # rename_field applies at the fetch stage
    t = s.fetch([h.docid for h in hits], columns=["role"])
    renamed = rename_field({"role": "speaker"})(t)
    assert "speaker" in renamed.column_names
    assert "role" not in renamed.column_names
