"""Wire-protocol server tests: requests are built exactly the way the
reference's Python client serializes them (client.py:135-246), so
passing here means the reference client works against this engine."""

from __future__ import annotations

import json
import urllib.request

import pytest

from df_spark.server import start_server

PORT = 3917
URI = f"http://127.0.0.1:{PORT}/call"


def call(dataframe, function):
    body = json.dumps({"dataframe": dataframe, "function": function}).encode()
    req = urllib.request.Request(URI, data=body, headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    httpd = start_server(spark, port=PORT)
    yield httpd
    httpd.shutdown()


@pytest.fixture(scope="module")
def small_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "small.csv"
    p.write_text("1|foo|true\n2|bar|false\n3|baz|true\n")
    return str(p)


SMALL_SCHEMA = {"columns": [
    {"name": "int", "type_": "Int"},
    {"name": "string", "type_": "String"},
    {"name": "bool", "type_": "Bool"},
]}


def test_example_small_flow(server, small_csv):
    # the reference client's example_small (client.py:248-256), request
    # by request: read → filter → select → aggregate → collect
    r = call(None, {"Read": ["csv", small_csv, SMALL_SCHEMA]})
    r = call(r["dataframe"], {"Op": {"Filter": ["bool", {
        "comparator": "Equal", "value": {"Bool": True}}]}})
    r = call(r["dataframe"], {"Op": {"Select": [{"Source": "int"}]}})
    r = call(r["dataframe"], {"Op": {"Aggregation": {"int": "Average"}}})
    r = call(r["dataframe"], {"Action": "Collect"})
    assert r["blocks"] == {"int": {"Float": [2.0]}}


def test_expression_ops_on_wire(server, small_csv):
    r = call(None, {"Read": ["csv", small_csv, SMALL_SCHEMA]})
    # (int + 1) * 2 aliased, exactly as client.py serializes operator
    # overloads (client.py:141-186)
    expr = {"Alias": ["x", {"Operation": ["Multiply",
            {"Operation": ["Add", {"Source": "int"}, {"Constant": {"Int": 1}}]},
            {"Constant": {"Int": 2}}]}]}
    r = call(r["dataframe"], {"Op": {"Select": [expr, {"Source": "string"}]}})
    r = call(r["dataframe"], {"Action": "Collect"})
    assert r["blocks"]["x"] == {"Int": [4, 6, 8]}


def test_join_nested_plan(server, small_csv):
    left = call(None, {"Read": ["csv", small_csv, SMALL_SCHEMA]})["dataframe"]
    right = call(None, {"Read": ["csv", small_csv, SMALL_SCHEMA]})["dataframe"]
    right = call(right, {"Op": {"Select": [
        {"Alias": ["r_int", {"Source": "int"}]},
        {"Alias": ["r_string", {"Source": "string"}]}]}})["dataframe"]
    r = call(left, {"Op": {"Join": [right, "int", "r_int"]}})
    r = call(r["dataframe"], {"Action": "Collect"})
    assert r["blocks"]["int"]["Int"] == r["blocks"]["r_int"]["Int"]
    assert sorted(r["blocks"]["string"]["String"]) == ["bar", "baz", "foo"]


def test_group_by_lists_on_wire(server, small_csv):
    r = call(None, {"Read": ["csv", small_csv, SMALL_SCHEMA]})
    r = call(r["dataframe"], {"Op": {"GroupBy": ["bool"]}})
    r = call(r["dataframe"], {"Action": "Collect"})
    # non-key columns become List blocks (reference grouped frame)
    assert "IntList" in r["blocks"]["int"]
    by_bool = dict(zip(r["blocks"]["bool"]["Bool"], r["blocks"]["int"]["IntList"]))
    assert sorted(by_bool[True]) == [1, 3]
    assert by_bool[False] == [2]


def test_count_and_take_implemented(server, small_csv):
    # the reference declares these but panics (src/api.rs:78)
    r = call(None, {"Read": ["csv", small_csv, SMALL_SCHEMA]})
    assert call(r["dataframe"], {"Action": "Count"})["blocks"] == {"count": {"Int": [3]}}
    taken = call(r["dataframe"], {"Action": {"Take": 2}})
    assert len(taken["blocks"]["int"]["Int"]) == 2


def test_wire_errors_are_400(server, small_csv):
    r = call(None, {"Read": ["csv", small_csv, SMALL_SCHEMA]})
    with pytest.raises(urllib.error.HTTPError) as exc:
        call(r["dataframe"], {"Op": {"Select": [{"Source": "nope"}]}})
    assert exc.value.code == 400
    body = json.loads(exc.value.read())
    assert "unknown column" in body["error"]


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/reference/client.py"),
    reason="reference checkout not present")
def test_reference_client_runs_unchanged(server, small_csv):
    # load the reference's own client (read-only checkout) and point it
    # at this server: its example flow must work verbatim
    import importlib.util

    pytest.importorskip("requests")
    spec = importlib.util.spec_from_file_location("ref_client", "/root/reference/client.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    ref.URI = URI
    schema = ref.Schema([("int", ref.Type.INT), ("string", ref.Type.STRING),
                         ("bool", ref.Type.BOOL)])
    out = (ref.Df.from_csv(small_csv, schema)
           .filter("bool", ref.Predicate(ref.Comparator.EQUAL, ref.Value(True)))
           .select([ref.c("int")])
           .aggregate({"int": ref.Aggregator.AVERAGE})
           .collect())
    assert out == {"int": {"Float": [2.0]}}
