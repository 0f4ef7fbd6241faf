"""_ship_package failure handling (ADVICE r3): an addPyFile failure must
surface a RuntimeWarning naming the cause — a silent swallow leaves
`ModuleNotFoundError` on executors as the only (far-away) symptom — and
must not retry on every prepare() call. Pure-Python: a fake session
stands in for SparkSession.
"""

from __future__ import annotations

import warnings

from tripgogo_vector_search_spark.session import _ship_package


class _FakeContext:
    def __init__(self, fail: bool):
        self.fail = fail
        self.shipped = []

    def addPyFile(self, path):
        if self.fail:
            raise RuntimeError("file server unavailable")
        self.shipped.append(path)


class _FakeSession:
    def __init__(self, fail: bool):
        self.sparkContext = _FakeContext(fail)


def test_ship_package_warns_on_addpyfile_failure():
    spark = _FakeSession(fail=True)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        _ship_package(spark)
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, RuntimeWarning)]
    assert any("addPyFile" in m and "file server unavailable" in m
               for m in msgs), msgs
    # marked shipped either way: one warning per session, not per query
    assert spark._tripgogo_pkg_shipped is True
    with warnings.catch_warnings(record=True) as again:
        warnings.simplefilter("always")
        _ship_package(spark)
    assert not again


def test_ship_package_ships_zip_once():
    spark = _FakeSession(fail=False)
    _ship_package(spark)
    assert len(spark.sparkContext.shipped) == 1
    assert spark.sparkContext.shipped[0].endswith(".zip")
    _ship_package(spark)
    assert len(spark.sparkContext.shipped) == 1
