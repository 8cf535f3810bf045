"""Frontend wiring tests.

There is no browser in this image, so the UI is pinned two ways:
- static wiring: every DOM id ``script.js`` dereferences must exist in
  ``index.html`` (catches control renames/removals — e.g. the round-3
  ``target-fps`` and ``times`` inputs);
- the server paths the UI's new controls hit (``target_fps`` retiming on
  ``/interpolate-video``, ``times`` on ``/interpolate-frames``) are covered
  in ``test_serve.py`` — here we additionally round-trip the static page
  through a real socket the way ``fi-tpu serve --frontend`` would serve it.
"""

import http.server
import os
import re
import threading
import urllib.request

import pytest

FRONTEND = os.path.join(os.path.dirname(__file__), "..", "frontend")


def _read(name):
    with open(os.path.join(FRONTEND, name), encoding="utf-8") as f:
        return f.read()


def test_all_js_dom_ids_exist_in_html():
    js = _read("script.js")
    html = _read("index.html")
    ids = set(re.findall(r'getElementById\("([^"]+)"\)', js))
    # dynamic ids built per-box: drop1/drop2/file1/file2 via "drop" + n
    for stem in re.findall(r'getElementById\("(\w+)" \+ n\)', js):
        ids.update({f"{stem}1", f"{stem}2"})
    assert ids, "no ids found — parse regression"
    html_ids = set(re.findall(r'id="([^"]+)"', html))
    missing = ids - html_ids
    assert not missing, f"script.js references missing ids: {sorted(missing)}"


def test_new_controls_present():
    html = _read("index.html")
    js = _read("script.js")
    # round-3 additions: fractional retiming + exact-time sampling
    assert 'id="target-fps"' in html
    assert 'id="times"' in html
    assert "target_fps" in js              # sent as the form field
    assert "/interpolate-frames" in js     # exact-times endpoint


def test_frontend_serves_over_socket(tmp_path):
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=FRONTEND, **kw)
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        for name, marker in (("index.html", b"target-fps"),
                             ("script.js", b"interpolate-frames")):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/{name}", timeout=30) as r:
                assert r.status == 200
                assert marker in r.read()
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_js_brace_balance():
    """Cheap syntax smoke test without a JS engine: balanced delimiters
    outside strings/comments."""
    js = _read("script.js")
    # strip strings and template literals FIRST (a URL like http:// would
    # otherwise read as a line comment), then comments
    js = re.sub(r'"(?:\\.|[^"\\])*"', '""', js)
    js = re.sub(r"'(?:\\.|[^'\\])*'", "''", js)
    js = re.sub(r'`(?:\\.|[^`\\])*`', '``', js)
    js = re.sub(r'//[^\n]*', '', js)
    js = re.sub(r'/\*.*?\*/', '', js, flags=re.S)
    for o, c in ("{}", "()", "[]"):
        assert js.count(o) == js.count(c), f"unbalanced {o}{c}"
