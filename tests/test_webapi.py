"""REST serving façade (webapi.py) — the reference's FastAPI surface
(webapi/main.py:143-745) re-expressed on Flask: envelope shape, paging
contract (pre-limit total + prev/next/first/last), objects/search/
facets/attributes endpoints, insert round-trip."""

import json

import pytest

flask = pytest.importorskip("flask")

from linkml_store_spark.client import Client  # noqa: E402
from linkml_store_spark.webapi import create_app  # noqa: E402

ROWS = [
    {"id": i, "status": "open" if i % 3 else "closed",
     "priority": ["low", "mid", "high"][i % 3], "score": float(i)}
    for i in range(25)
]


@pytest.fixture(scope="module")
def api(spark):
    client = Client(spark)
    db = client.attach_database("memory", alias="maindb")
    coll = db.create_collection("issues", identifier_attribute="id")
    coll.insert(ROWS)
    app = create_app(client)
    app.config["TESTING"] = True
    with app.test_client() as tc:
        yield tc


def _body(resp):
    assert resp.mimetype == "application/json"
    return json.loads(resp.get_data(as_text=True))


def test_top_and_config(api):
    b = _body(api.get("/"))
    assert {l["rel"] for l in b["links"]} >= {"self", "databases"}
    b = _body(api.get("/config"))
    assert "maindb" in b["data"]["databases"]


def test_list_databases_and_details(api):
    b = _body(api.get("/databases"))
    assert [i["name"] for i in b["items"]] == ["maindb"]
    b = _body(api.get("/databases/maindb"))
    assert b["data"]["collections"] == ["issues"]
    assert api.get("/databases/nope").status_code == 404


def test_collections_listing_and_details(api):
    b = _body(api.get("/databases/maindb/collections"))
    assert [i["name"] for i in b["items"]] == ["issues"]
    b = _body(api.get("/databases/maindb/collections/issues"))
    assert b["data"]["count"] == 25
    assert b["data"]["identifier_attribute"] == "id"


def test_objects_paging_contract(api):
    b = _body(api.get(
        "/databases/maindb/collections/issues/objects?limit=10&offset=10"
    ))
    m = b["meta"]
    assert m["paged"] and m["item_count"] == 25  # PRE-limit total
    assert m["page"] == 2 and m["page_size"] == 10
    assert len(b["items"]) == 10
    rels = {l["rel"] for l in b["links"]}
    assert {"self", "prev", "next", "first", "last"} <= rels
    # item self-links address objects by identifier
    assert b["items"][0]["links"][0]["href"].startswith(
        "/databases/maindb/collections/issues/objects/"
    )


def test_objects_where_filter(api):
    where = json.dumps({"status": "closed"})
    b = _body(api.get(
        f"/databases/maindb/collections/issues/objects?where={where}&limit=100"
    ))
    assert b["meta"]["item_count"] == len(
        [r for r in ROWS if r["status"] == "closed"]
    )
    assert all(i["data"]["status"] == "closed" for i in b["items"])


def test_object_details_typed_id(api):
    b = _body(api.get("/databases/maindb/collections/issues/objects/7"))
    assert b["data"]["id"] == 7 and b["data"]["status"] == "open"
    assert api.get(
        "/databases/maindb/collections/issues/objects/999"
    ).status_code == 404


def test_facets_and_attribute_values(api):
    b = _body(api.get(
        "/databases/maindb/collections/issues/facets?facet_columns=status"
    ))
    counts = {d["value"]: d["count"] for d in b["data"]["items"]["status"]}
    assert counts == {"open": 16, "closed": 9}
    b = _body(api.get(
        "/databases/maindb/collections/issues/attributes/priority"
    ))
    assert {i["name"]: i["data"]["count"] for i in b["items"]} == {
        "low": 9, "mid": 8, "high": 8,
    }


def test_attributes_listing_reflects_schema(api):
    b = _body(api.get("/databases/maindb/collections/issues/attributes"))
    atts = {i["name"]: i["data"] for i in b["items"]}
    assert atts["score"]["range"] in ("double", "float")
    assert atts["status"]["range"] == "string"


def test_query_by_attribute_equals(api):
    b = _body(api.get(
        "/databases/maindb/collections/issues/attributes/status"
        "/equals/closed?limit=5"
    ))
    assert b["meta"]["item_count"] == 9 and len(b["items"]) == 5
    # numeric retry: typed int column queried through the URL string
    b = _body(api.get(
        "/databases/maindb/collections/issues/attributes/id/equals/7"
    ))
    assert b["meta"]["item_count"] == 1


def test_search_endpoint_ranks(api):
    b = _body(api.get(
        "/databases/maindb/collections/issues/search/closed%20high?limit=5"
    ))
    assert b["items"], "search returned nothing"
    scores = [i["data"]["score"] for i in b["items"]]
    assert scores == sorted(scores, reverse=True)
    assert b["items"][0]["data"]["object"]["status"] == "closed"


def test_insert_and_create_roundtrip(api):
    r = api.post(
        "/databases/maindb/collections/scratch/create",
        json={"identifier_attribute": "k"},
    )
    assert r.status_code == 201
    r = api.post(
        "/databases/maindb/collections/scratch/objects",
        json={"objects": [{"k": 1, "v": "x"}, {"k": 2, "v": "y"}]},
    )
    assert r.status_code == 201 and _body(r)["data"]["inserted"] == 2
    b = _body(api.get("/databases/maindb/collections/scratch/objects"))
    assert b["meta"]["item_count"] == 2


def test_database_schema(api):
    b = _body(api.get("/databases/maindb/schema"))
    assert "issues" in b["data"]["classes"]
    assert "status" in b["data"]["classes"]["issues"]["attributes"]


def test_malformed_params_get_400_envelope(api):
    """ADVICE r11: '?limit=abc' and non-JSON where must return the
    documented errors envelope with HTTP 400, not a Flask 500."""
    for url in [
        "/databases/maindb/collections/issues/objects?limit=abc",
        "/databases/maindb/collections/issues/objects?offset=x",
        "/databases/maindb/collections/issues/objects?where=notjson",
        "/databases/maindb/collections/issues/objects?where=[1,2]",
        "/databases/maindb/collections/issues/search/open?limit=1e3",
        "/databases/maindb/collections/issues/facets?where={bad",
    ]:
        r = api.get(url)
        assert r.status_code == 400, url
        b = _body(r)
        assert b["errors"] and b["errors"][0]["code"] == "bad_request", url


def test_concurrent_first_search_attaches_one_indexer(api):
    """ADVICE r11: concurrent first requests to GET /search must not
    race the one-time default-indexer attach (double-checked lock).
    Each thread gets its OWN test client — Flask context stacks are
    thread-local."""
    import threading

    # fresh collection so no indexer exists yet
    api.post(
        "/databases/maindb/collections/conc/create",
        json={"identifier_attribute": "k"},
    )
    api.post(
        "/databases/maindb/collections/conc/objects",
        json={"objects": [{"k": i, "v": f"term{i % 3}"} for i in range(9)]},
    )
    app = api.application
    codes = []

    def hit():
        codes.append(app.test_client().get(
            "/databases/maindb/collections/conc/search/term1"
        ).status_code)

    threads = [threading.Thread(target=hit) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert codes == [200] * 6
    b = _body(api.get("/databases/maindb/collections/conc/search/term2"))
    assert b["items"]


def test_objects_paging_stays_valid_over_mutation(api):
    """Paging contract under concurrent mutation: a page fetched AFTER
    an insert reflects the new total, stays inside the envelope
    contract, and page windows never error — the find() path re-counts
    rather than serving a stale cached total."""
    api.post(
        "/databases/maindb/collections/mut/create",
        json={"identifier_attribute": "k"},
    )
    api.post(
        "/databases/maindb/collections/mut/objects",
        json={"objects": [{"k": i, "v": i * 2} for i in range(15)]},
    )
    p1 = _body(api.get("/databases/maindb/collections/mut/objects?limit=10"))
    assert p1["meta"]["item_count"] == 15 and len(p1["items"]) == 10
    # mutate between page fetches
    r = api.post(
        "/databases/maindb/collections/mut/objects",
        json={"objects": [{"k": 100 + i, "v": -1} for i in range(3)]},
    )
    assert r.status_code == 201
    p2 = _body(api.get(
        "/databases/maindb/collections/mut/objects?limit=10&offset=10"
    ))
    assert p2["meta"]["item_count"] == 18  # pre-limit total re-counted
    assert len(p2["items"]) == 8
    # an offset past the end is a valid empty page, not an error
    p3 = _body(api.get(
        "/databases/maindb/collections/mut/objects?limit=10&offset=30"
    ))
    assert p3["items"] == [] and p3["meta"]["item_count"] == 18


def test_browser_page_renders_over_existing_routes(api):
    """The /browser data-browser page (reference Streamlit app analog):
    static HTML that drives only EXISTING endpoints — replay the exact
    fetch sequence the page issues and assert every route exists."""
    r = api.get("/browser")
    assert r.status_code == 200 and r.mimetype == "text/html"
    html = r.get_data(as_text=True)
    assert "LinkML Table Browser" in html
    assert "<script>" in html and "http" not in html.split("<script>")[0], \
        "page must carry no external assets"
    # the page's fetch sequence, as its JS builds the URLs
    seq = [
        "/databases",
        "/databases/maindb/collections",
        "/databases/maindb/collections/issues/attributes",
        "/databases/maindb/collections/issues/objects?limit=25&offset=0",
        "/databases/maindb/collections/issues/objects?limit=25&offset=0"
        "&where=%7B%22status%22%3A%20%22open%22%7D",
        "/databases/maindb/collections/issues/facets?facet_columns=status"
        "&where=%7B%22status%22%3A%20%22open%22%7D",
    ]
    for url in seq:
        b = _body(api.get(url))
        assert not b["errors"], url
    # the top route advertises the browser
    top = _body(api.get("/"))
    assert any(l["rel"] == "browser" for l in top["links"])
