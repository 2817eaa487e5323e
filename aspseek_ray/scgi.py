"""s.cgi front-end (SURVEY §3.3): CGI params -> socket to searchd ->
render an s.htm-style template with result variables.

The reference's CGI binary (``src/s.cpp`` [M name], ``src/templates.cpp``)
reads a template split into named sections and substitutes ``$(var)``
placeholders; excerpts come back from the stored daemon.  This module
rebuilds that skin over :class:`aspseek_ray.daemon.SearchdClient`:

* :func:`parse_params` — the CGI query-string contract: ``q`` (query),
  ``np`` (page number, 0-based), ``ps`` (page size), ``gr`` (group by
  site: max results per host, 0 = off).
* :func:`render_page` — run the search through a connected client and
  render the template.  Sections (each delimited ``<!--name-->`` ...
  ``<!--/name-->``, the reference's template grammar): ``top``,
  ``restop`` (once, before results), ``res`` (per result), ``notfound``,
  ``error`` (query parse errors), ``bottom``.  Variables: ``$(q)``,
  ``$(total)``, ``$(first)``, ``$(last)``, ``$(np)``, ``$(ps)``,
  ``$(url)``, ``$(score)``, ``$(excerpt)``, ``$(host)``, ``$(error)``,
  ``$(next_np)``, ``$(prev_np)``.  All substituted values are
  HTML-escaped.
"""

from __future__ import annotations

import html
import re
from urllib.parse import parse_qs

from aspseek_ray.daemon import DaemonError, SearchdClient

DEFAULT_TEMPLATE = """\
<!--top-->
<html><head><title>aspseek_ray: $(q)</title></head><body>
<form action="s.cgi"><input type="text" name="q" value="$(q)"></form>
<!--/top-->
<!--restop-->
<p>Results $(first)-$(last) of $(total) for <b>$(q)</b></p><ol>
<!--/restop-->
<!--res-->
<li><a href="$(url)">$(url)</a> <small>[$(score)] $(host)</small>
<blockquote>$(excerpt)</blockquote></li>
<!--/res-->
<!--resbot-->
</ol><p>page $(np) &middot; prev=$(prev_np) next=$(next_np)</p>
<!--/resbot-->
<!--notfound-->
<p>No results for <b>$(q)</b>.</p>
<!--/notfound-->
<!--error-->
<p>Query error: $(error)</p>
<!--/error-->
<!--bottom-->
</body></html>
<!--/bottom-->
"""

_VAR_RE = re.compile(r"\$\((\w+)\)")


def _sections(template: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for m in re.finditer(r"<!--(\w+)-->\n?(.*?)<!--/\1-->\n?", template,
                         re.S):
        out[m.group(1)] = m.group(2)
    return out


def _subst(section: str, vars_: dict[str, object]) -> str:
    def repl(m: re.Match) -> str:
        v = vars_.get(m.group(1), "")
        return html.escape(str(v), quote=True)

    return _VAR_RE.sub(repl, section)


def parse_params(query_string: str) -> dict:
    """CGI parameter contract (reference defaults: 10 results/page)."""
    qs = parse_qs(query_string, keep_blank_values=True)

    def one(name: str, default: str) -> str:
        return qs.get(name, [default])[0]

    def num(name: str, default: int, floor: int) -> int:
        try:
            return max(floor, int(one(name, str(default)) or default))
        except ValueError:      # junk CGI input falls back to the default
            return default

    return {
        "q": one("q", ""),
        "np": num("np", 0, 0),
        "ps": num("ps", 10, 1),
        "gr": num("gr", 0, 0),
    }


def render_page(query_string: str, client: SearchdClient,
                template: str | None = None) -> str:
    """The s.cgi request lifecycle: params -> searchd -> template."""
    params = parse_params(query_string)
    secs = _sections(template if template is not None else DEFAULT_TEMPLATE)
    base = {"q": params["q"], "np": params["np"], "ps": params["ps"]}

    parts = [_subst(secs.get("top", ""), base)]
    try:
        resp = client.search(params["q"], page=params["np"],
                             page_size=params["ps"], per_site=params["gr"])
    except DaemonError as e:
        parts.append(_subst(secs.get("error", ""),
                            {**base, "error": str(e)}))
        parts.append(_subst(secs.get("bottom", ""), base))
        return "".join(parts)

    if resp["total"] == 0:
        parts.append(_subst(secs.get("notfound", ""), base))
    else:
        page_vars = {**base, "total": resp["total"],
                     "first": resp["first"], "last": resp["last"],
                     "prev_np": max(0, params["np"] - 1),
                     "next_np": params["np"] + 1
                     if resp["last"] < resp["total"] else params["np"]}
        parts.append(_subst(secs.get("restop", ""), page_vars))
        res_sec = secs.get("res", "")
        for row in resp["results"]:
            parts.append(_subst(res_sec, {**page_vars, **row,
                                          "score": f"{row['score']:.4f}"}))
        parts.append(_subst(secs.get("resbot", ""), page_vars))
    parts.append(_subst(secs.get("bottom", ""), base))
    return "".join(parts)
