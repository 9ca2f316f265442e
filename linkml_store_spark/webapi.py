"""REST serving façade over Client/Database/Collection.

A thin hypermedia JSON API mirroring the reference's FastAPI surface
(reference ``webapi/main.py:143-745``): the same URL scheme
(``/databases/{db}/collections/{coll}/objects|search|facets|attributes``),
the same response envelope (``meta`` / ``items`` / ``item_type`` /
``data`` / ``links`` / ``errors``), the same paging contract (pre-limit
total count, prev/next/first/last links). Built on Flask (FastAPI is not
in this environment); every endpoint is a direct call into the engine —
no query logic lives here.

Usage::

    from linkml_store_spark import Client
    from linkml_store_spark.webapi import create_app

    app = create_app(Client())
    app.run()          # or any WSGI server; app.test_client() in tests
"""

from __future__ import annotations

import json
import uuid
from datetime import date, datetime, timezone
from typing import Any, Dict, List, Optional

try:
    from flask import Flask, Response, request
except ImportError:  # pragma: no cover - optional dependency
    Flask = None  # type: ignore[assignment]

MAX_PAGE_SIZE = 100


#: the /browser single-page data browser (reference
#: ``linkml_data_browser/app.py:18-199`` semantics over this API's
#: endpoints; DEFAULT_LIMIT there is 25 rows/page). No external assets —
#: the page must render offline.
_BROWSER_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>LinkML Table Browser</title>
<style>
 body{font-family:system-ui,sans-serif;margin:1.5rem;color:#222}
 h1{font-size:1.3rem}
 .row{display:flex;gap:2rem;align-items:flex-start}
 #sidebar{min-width:240px;max-width:300px}
 .filter{margin-bottom:.5rem}
 .filter input{width:70%}
 .filter button{width:1.8em}
 table{border-collapse:collapse;font-size:.85rem}
 th,td{border:1px solid #ccc;padding:.25rem .5rem;text-align:left}
 th{background:#f0f0f0}
 .facet{font-size:.8rem;margin:.25rem 0 .5rem 2em;color:#444}
 .pager button{margin-right:.5rem}
 #meta{margin:.5rem 0}
</style></head><body>
<h1>LinkML Table Browser</h1>
<div>
 <label>Select a Database <select id="db"></select></label>
 <label>Select a Table <select id="coll"></select></label>
</div>
<div class="row">
 <div id="sidebar"><h3>Filters</h3><div id="filters"></div></div>
 <div id="main">
  <div id="meta"></div>
  <div class="pager">
   <button onclick="go('first')">First</button>
   <button onclick="go('prev')">Previous</button>
   <button onclick="go('next')">Next</button>
   <button onclick="go('last')">Last</button>
  </div>
  <table id="tbl"><thead></thead><tbody></tbody></table>
 </div>
</div>
<script>
const LIMIT = 25;
let page = 0, total = 0, filters = {}, facetOpen = {};
const $ = (id) => document.getElementById(id);
const j = async (url) => (await fetch(url)).json();
const base = () =>
  `/databases/${$('db').value}/collections/${$('coll').value}`;
const whereParam = () => {
  const w = {};
  for (const [k, v] of Object.entries(filters)) if (v !== '') w[k] = v;
  return Object.keys(w).length
    ? '&where=' + encodeURIComponent(JSON.stringify(w)) : '';
};
async function loadDbs() {
  const b = await j('/databases');
  $('db').innerHTML = (b.items || [])
    .map((d) => `<option>${d.name}</option>`).join('');
  await loadColls();
}
async function loadColls() {
  const b = await j(`/databases/${$('db').value}/collections`);
  $('coll').innerHTML = (b.items || [])
    .map((c) => `<option>${c.name}</option>`).join('');
  await loadAttrs();
}
async function loadAttrs() {
  filters = {}; facetOpen = {}; page = 0;
  const b = await j(`${base()}/attributes`);
  $('filters').innerHTML = (b.items || []).map((a) => `
    <div class="filter">
     <button onclick="toggleFacet('${a.name}')">&#9660;</button>
     <input placeholder="Filter by ${a.name}" id="f_${a.name}"
       onchange="setFilter('${a.name}', this.value)">
     <div class="facet" id="facet_${a.name}"></div>
    </div>`).join('');
  await refresh();
}
function setFilter(name, value) {
  filters[name] = value; page = 0;  // filter change resets pagination
  refresh();
}
async function toggleFacet(name) {
  facetOpen[name] = !facetOpen[name];
  await renderFacet(name);
}
async function renderFacet(name) {
  const el = $('facet_' + name);
  if (!facetOpen[name]) { el.innerHTML = ''; return; }
  const b = await j(
    `${base()}/facets?facet_columns=${name}${whereParam()}`);
  const vals = ((b.data || {}).items || {})[name] || [];
  el.innerHTML = vals.map(
    (f) => `${f.value === null ? 'null' : f.value}: ${f.count}`
  ).join('<br>');
}
async function refresh() {
  const b = await j(
    `${base()}/objects?limit=${LIMIT}&offset=${page * LIMIT}` +
    whereParam());
  total = b.meta.item_count || 0;
  $('meta').textContent =
    `Number of rows: ${total} — Page: ${page + 1}`;
  const rows = (b.items || []).map((i) => i.data);
  const cols = rows.length ? Object.keys(rows[0]) : [];
  $('tbl').tHead.innerHTML =
    '<tr>' + cols.map((c) => `<th>${c}</th>`).join('') + '</tr>';
  $('tbl').tBodies[0].innerHTML = rows.map((r) =>
    '<tr>' + cols.map((c) =>
      `<td>${r[c] === null ? '' : r[c]}</td>`).join('') + '</tr>'
  ).join('');
  for (const name of Object.keys(facetOpen)) await renderFacet(name);
}
function go(dir) {
  const lastPage = Math.max(0, Math.ceil(total / LIMIT) - 1);
  if (dir === 'first') page = 0;
  else if (dir === 'prev') page = Math.max(0, page - 1);
  else if (dir === 'next') page = Math.min(lastPage, page + 1);
  else page = lastPage;
  refresh();
}
$('db').onchange = loadColls;
$('coll').onchange = loadAttrs;
loadDbs();
</script></body></html>
"""


class _BadRequestError(Exception):
    """Malformed query parameter — rendered as the API's 400 envelope
    (not a Flask 500): raised by ``page_args``/``parse_where`` and
    caught by the app-level errorhandler (ADVICE r11)."""


def _json_default(o):
    if isinstance(o, (datetime, date)):
        return o.isoformat()
    if isinstance(o, bytes):
        return o.hex()
    return str(o)


def _link(rel: str, href: str) -> Dict[str, str]:
    return {"rel": rel, "href": href}


def _meta(path: str, template: str, params: Dict[str, Any],
          **page_fields) -> Dict[str, Any]:
    m = {
        "path": path,
        "path_template": template,
        "params": params,
        "timestamp": datetime.now(timezone.utc).isoformat(),
        "version": "1.0",
        "request_id": str(uuid.uuid4()),
        "item_count": None,
        "paged": False,
        "page": 1,
        "page_size": None,
    }
    m.update(page_fields)
    return m


def _page_links(base_url: str, limit: int, offset: int,
                total_count: int) -> List[Dict[str, str]]:
    """prev/next/first/last paging links (reference main.py:350-372)."""
    total_pages = max((total_count + limit - 1) // limit, 1)
    current = offset // limit + 1
    links = [_link("self", f"{base_url}?limit={limit}&offset={offset}")]
    if current > 1:
        links.append(
            _link("prev", f"{base_url}?limit={limit}&offset={offset - limit}")
        )
    if current < total_pages:
        links.append(
            _link("next", f"{base_url}?limit={limit}&offset={offset + limit}")
        )
    links.append(_link("first", f"{base_url}?limit={limit}&offset=0"))
    links.append(
        _link(
            "last",
            f"{base_url}?limit={limit}&offset={(total_pages - 1) * limit}",
        )
    )
    return links


def create_app(client) -> "Flask":
    """Build the WSGI app over an attached :class:`Client`."""
    if Flask is None:  # pragma: no cover
        raise ImportError("flask is required for the web API façade")
    import threading

    app = Flask("linkml_store_spark")
    _indexer_lock = threading.Lock()

    def respond(payload: Dict[str, Any], status: int = 200) -> Response:
        return Response(
            json.dumps(payload, default=_json_default),
            status=status,
            mimetype="application/json",
        )

    def envelope(template: str, params: Dict[str, Any], *,
                 items=None, item_type=None, data=None, links=None,
                 errors=None, **page_fields) -> Dict[str, Any]:
        return {
            "meta": _meta(request.path, template, params, **page_fields),
            "items": items,
            "item_type": item_type,
            "data": data,
            "links": links,
            "errors": errors,
        }

    def fail(code: str, message: str, status: int) -> Response:
        return respond(
            envelope("error", {},
                     errors=[{"code": code, "message": message,
                              "details": None}]),
            status=status,
        )

    def get_db(name: str):
        try:
            return client.get_database(name)
        except KeyError:
            return None

    def parse_where() -> Optional[dict]:
        raw = request.args.get("where")
        if not raw:
            return None
        try:
            parsed = json.loads(raw)
        except json.JSONDecodeError as e:
            raise _BadRequestError(f"where must be a JSON object: {e}")
        if not isinstance(parsed, dict):
            raise _BadRequestError("where must be a JSON object")
        return parsed

    def page_args():
        try:
            limit = min(max(int(request.args.get("limit", 10)), 1),
                        MAX_PAGE_SIZE)
            offset = max(int(request.args.get("offset", 0)), 0)
        except (TypeError, ValueError):
            raise _BadRequestError("limit/offset must be integers")
        return limit, offset

    @app.errorhandler(_BadRequestError)
    def _bad_request(e):
        return fail("bad_request", str(e), 400)

    # ------------------------------------------------------------- #

    @app.get("/")
    def top():
        return respond(envelope("top", {}, links=[
            _link("self", "/"),
            _link("databases", "/databases"),
            _link("config", "/config"),
            _link("browser", "/browser"),
        ]))

    @app.get("/browser")
    def browser():
        # the data-browser analog of the reference's Streamlit app
        # (linkml_data_browser/app.py:18-199): database/table selectors,
        # per-attribute equality filters with facet toggles, a 25-row
        # page with Prev/Next/First/Last and the pre-limit total — all
        # rendered client-side from the EXISTING JSON endpoints (this
        # route serves only static HTML; no query logic lives here)
        return Response(_BROWSER_HTML, mimetype="text/html")

    @app.get("/config")
    def config():
        return respond(envelope("config", {}, data={
            "databases": {
                alias: {"handle": db.handle}
                for alias, db in client.databases.items()
            },
        }, links=[_link("self", "/config"), _link("parent", "/")]))

    @app.get("/databases")
    def list_databases():
        items = [
            {
                "name": alias,
                "type": "Database",
                "data": {"handle": db.handle},
                "links": [_link("self", f"/databases/{alias}")],
            }
            for alias, db in client.databases.items()
        ]
        return respond(envelope(
            "databases", {}, items=items,
            item_type={"name": "Database", "description": None},
            links=[_link("self", "/databases"), _link("parent", "/")],
        ))

    @app.post("/database/create")
    def create_database():
        body = request.get_json(force=True)
        db = client.attach_database(body["handle"], alias=body.get("name"))
        return respond(envelope(
            "database_create", {"name": db.alias},
            data={"name": db.alias, "handle": db.handle},
            links=[_link("self", f"/databases/{db.alias}")],
        ), status=201)

    @app.get("/databases/<db_name>")
    def database_details(db_name):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        return respond(envelope(
            "database", {"database_name": db_name},
            data={"name": db_name, "handle": db.handle,
                  "collections": db.list_collection_names()},
            links=[
                _link("self", f"/databases/{db_name}"),
                _link("collections", f"/databases/{db_name}/collections"),
                _link("parent", "/databases"),
            ],
        ))

    @app.get("/databases/<db_name>/collections")
    def list_collections(db_name):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        items = [
            {
                "name": name,
                "type": "Collection",
                "data": {},
                "links": [_link(
                    "self", f"/databases/{db_name}/collections/{name}"
                )],
            }
            for name in db.list_collection_names()
        ]
        return respond(envelope(
            "collections", {"database_name": db_name}, items=items,
            item_type={"name": "Collection", "description": None},
            links=[_link("self", f"/databases/{db_name}/collections"),
                   _link("parent", f"/databases/{db_name}")],
        ))

    @app.get("/databases/<db_name>/collections/<coll_name>")
    def collection_details(db_name, coll_name):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        coll = db.get_collection(coll_name)
        base = f"/databases/{db_name}/collections/{coll_name}"
        return respond(envelope(
            "collection",
            {"database_name": db_name, "collection_name": coll_name},
            data={
                "name": coll_name,
                "count": coll.size() if coll.exists() else 0,
                "identifier_attribute": coll.identifier_attribute,
            },
            links=[
                _link("self", base),
                _link("objects", f"{base}/objects"),
                _link("facets", f"{base}/facets"),
                _link("attributes", f"{base}/attributes"),
                _link("parent", f"/databases/{db_name}/collections"),
            ],
        ))

    @app.post("/databases/<db_name>/collections/<coll_name>/create")
    def create_collection(db_name, coll_name):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        body = request.get_json(silent=True) or {}
        db.create_collection(
            coll_name,
            identifier_attribute=body.get("identifier_attribute"),
        )
        return respond(envelope(
            "collection_create",
            {"database_name": db_name, "collection_name": coll_name},
            data={"name": coll_name},
            links=[_link(
                "self", f"/databases/{db_name}/collections/{coll_name}"
            )],
        ), status=201)

    @app.get("/databases/<db_name>/collections/<coll_name>/objects")
    def list_objects(db_name, coll_name):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        coll = db.get_collection(coll_name)
        limit, offset = page_args()
        result = coll.find(parse_where(), limit=limit, offset=offset)
        base = f"/databases/{db_name}/collections/{coll_name}/objects"
        id_att = coll.identifier_attribute
        items = []
        for i, row in enumerate(result.rows):
            name = str(row[id_att]) if id_att else str(offset + i)
            items.append({
                "name": name,
                "type": None,
                "data": row,
                "links": [_link("self", f"{base}/{name}")],
            })
        total = result.num_rows  # pre-limit count, reference contract
        return respond(envelope(
            "objects",
            {"database_name": db_name, "collection_name": coll_name},
            items=items,
            item_type={"name": coll_name, "description": None},
            data={},
            links=_page_links(base, limit, offset, total) + [
                _link("parent",
                      f"/databases/{db_name}/collections/{coll_name}"),
            ],
            paged=True, item_count=total,
            page=offset // limit + 1, page_size=limit,
        ))

    @app.post("/databases/<db_name>/collections/<coll_name>/objects")
    def insert_objects(db_name, coll_name):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        body = request.get_json(force=True)
        objs = body.get("objects", [])
        n = db.get_collection(coll_name).insert(objs)
        return respond(envelope(
            "objects_insert",
            {"database_name": db_name, "collection_name": coll_name},
            data={"inserted": n},
            links=[_link(
                "self",
                f"/databases/{db_name}/collections/{coll_name}/objects",
            )],
        ), status=201)

    @app.get("/databases/<db_name>/collections/<coll_name>/objects/<obj_id>")
    def object_details(db_name, coll_name, obj_id):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        coll = db.get_collection(coll_name)
        id_att = coll.identifier_attribute
        if not id_att:
            return fail("no_identifier",
                        f"collection {coll_name!r} has no identifier "
                        "attribute", 400)
        # ids are typed columns; try the raw string then a numeric cast
        obj = coll.get_one(obj_id)
        if obj is None:
            try:
                obj = coll.get_one(int(obj_id))
            except ValueError:
                pass
        if obj is None:
            return fail("not_found", f"no object {obj_id!r}", 404)
        base = f"/databases/{db_name}/collections/{coll_name}"
        return respond(envelope(
            "object",
            {"database_name": db_name, "collection_name": coll_name,
             "id": obj_id},
            data=obj,
            links=[_link("self", f"{base}/objects/{obj_id}"),
                   _link("parent", f"{base}/objects")],
        ))

    @app.get("/databases/<db_name>/collections/<coll_name>/search/<term>")
    def search_objects(db_name, coll_name, term):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        coll = db.get_collection(coll_name)
        limit, _offset = page_args()
        if not coll.indexers:
            # double-checked under a lock: two concurrent first searches
            # must not both attach/build the default indexer (ADVICE
            # r11 — GET stays idempotent; the one-time attach is guarded)
            with _indexer_lock:
                if not coll.indexers:
                    coll.attach_indexer("simple")
        result = coll.search(term, limit=limit)
        base = f"/databases/{db_name}/collections/{coll_name}"
        id_att = coll.identifier_attribute
        items = []
        for score, row in result.ranked_rows or []:
            name = str(row.get(id_att)) if id_att else None
            items.append({
                "name": name,
                "type": None,
                "data": {"score": score, "object": row},
                "links": [_link("self", f"{base}/objects/{name}")]
                if name else [],
            })
        return respond(envelope(
            "search",
            {"database_name": db_name, "collection_name": coll_name,
             "term": term},
            items=items, item_count=len(items),
            links=[_link("self", f"{base}/search/{term}"),
                   _link("parent", base)],
        ))

    @app.get("/databases/<db_name>/collections/<coll_name>/facets")
    def collection_facets(db_name, coll_name):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        coll = db.get_collection(coll_name)
        cols_arg = request.args.get("facet_columns")
        cols = cols_arg.split(",") if cols_arg else None
        facets = coll.query_facets(parse_where(), facet_columns=cols)
        # JSON object keys must be strings; compound facet keys are tuples
        data = {
            (k if isinstance(k, str) else "+".join(k)):
                [{"value": v, "count": c} for v, c in vs]
            for k, vs in facets.items()
        }
        base = f"/databases/{db_name}/collections/{coll_name}"
        return respond(envelope(
            "facets",
            {"database_name": db_name, "collection_name": coll_name},
            data={"items": data, "total_count": coll.size()},
            links=[_link("self", f"{base}/facets"),
                   _link("collection", base),
                   _link("database", f"/databases/{db_name}")],
        ))

    @app.get("/databases/<db_name>/collections/<coll_name>/attributes")
    def collection_attributes(db_name, coll_name):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        coll = db.get_collection(coll_name)
        cd = coll.class_definition()
        base = f"/databases/{db_name}/collections/{coll_name}/attributes"
        items = [
            {
                "name": att,
                "type": "Attribute",
                "data": spec,
                "links": [_link("self", f"{base}/{att}")],
            }
            for att, spec in cd.get("attributes", {}).items()
        ]
        return respond(envelope(
            "attributes",
            {"database_name": db_name, "collection_name": coll_name},
            items=items,
            item_type={"name": "Attribute", "description": None},
            links=[_link("self", base)],
        ))

    @app.get(
        "/databases/<db_name>/collections/<coll_name>/attributes/<att>"
    )
    def attribute_details(db_name, coll_name, att):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        coll = db.get_collection(coll_name)
        facets = coll.query_facets(parse_where(), facet_columns=[att])
        counts = facets.get(att, [])
        base = (f"/databases/{db_name}/collections/{coll_name}"
                f"/attributes/{att}")
        items = [
            {
                "name": str(v),
                "type": "Value",
                "data": {"count": c},
                "links": [_link("self", f"{base}/equals/{v}")],
            }
            for v, c in counts
        ]
        cd = coll.class_definition()
        return respond(envelope(
            "facets",
            {"database_name": db_name, "collection_name": coll_name},
            items=items,
            data={"attribute": cd.get("attributes", {}).get(att)},
            links=[_link("self", base)],
        ))

    @app.get(
        "/databases/<db_name>/collections/<coll_name>"
        "/attributes/<att>/equals/<value>"
    )
    def query_by_attribute(db_name, coll_name, att, value):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        coll = db.get_collection(coll_name)
        limit, offset = page_args()
        # string URLs vs typed columns: retry numerically on empty
        result = coll.find({att: value}, limit=limit, offset=offset)
        if result.num_rows == 0:
            try:
                result = coll.find(
                    {att: int(value)}, limit=limit, offset=offset
                )
            except ValueError:
                pass
        base = (f"/databases/{db_name}/collections/{coll_name}"
                f"/attributes/{att}/equals/{value}")
        items = [
            {"name": None, "type": None, "data": row, "links": []}
            for row in result.rows
        ]
        return respond(envelope(
            "query",
            {"database_name": db_name, "collection_name": coll_name,
             "attribute": att, "value": value},
            items=items,
            links=_page_links(base, limit, offset, result.num_rows),
            paged=True, item_count=result.num_rows,
            page=offset // limit + 1, page_size=limit,
        ))

    @app.get("/databases/<db_name>/schema")
    def database_schema(db_name):
        db = get_db(db_name)
        if db is None:
            return fail("not_found", f"no database {db_name!r}", 404)
        classes = {
            name: db.get_collection(name).class_definition()
            for name in db.list_collection_names()
        }
        return respond(envelope(
            "schema", {"database_name": db_name},
            data={"name": db_name, "classes": classes},
            links=[_link("self", f"/databases/{db_name}/schema"),
                   _link("parent", f"/databases/{db_name}")],
        ))

    return app
