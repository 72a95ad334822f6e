"""Deterministic HTML rendering for the synthetic world.

The crawl engine's production I/O boundary is an HTTP transport + an
HTML site-rule parser (``plans/http_fetch.py``).  To test that path
end-to-end without a network, the synthetic world can serve every page
as real HTML: :func:`render_page` renders a :class:`PageDoc` the way the
reference's target webstores structure theirs (selector classes modeled
on /root/reference/src/crawlers/wintergreen.rs:66,90 —
``menu-navigation__sections-item-link`` category menus and
``module-pagination`` blocks), and :func:`world_http_transport` is a
transport double that answers ``GET url`` with those bytes (pages,
``/img/<id>`` payloads, ``/robots.txt``).

Round-trip contract (pinned by tests/test_http_fetch.py): parsing
``render_page(doc)`` with ``parse_site_html`` reproduces the exact
fields the in-process world fetch emits — including empty-SKU /
whitespace-name invalid rows, NBSP price strings, entity-escaped
variants JSON (S6), and byte-identical image captions.
"""

from __future__ import annotations

import html
from urllib.parse import urlsplit, urlunsplit

from .worldgen import PageDoc, SyntheticWorld, make_image_bytes


def _relative_href(base_url: str, target_url: str) -> str:
    """Render same-host links the way real markup does — host-relative
    (``/cat/3?page=2``) — so the parse path has to absolutize against
    the page URL (S4, wintergreen.rs:69-72 ``base_url.join(href)``)."""
    b, t = urlsplit(base_url), urlsplit(target_url)
    if t.netloc and t.netloc != b.netloc:
        return target_url
    return urlunsplit(("", "", t.path or "/", t.query, t.fragment))


def render_page(doc: PageDoc) -> str:
    """One deterministic HTML document per PageDoc."""
    e = html.escape
    out = [f'<!DOCTYPE html>\n<html><body class="kind-{doc.kind}">']
    if doc.kind == "seed":
        out.append('<nav class="menu-navigation">')
        for href in doc.out_links:
            out.append(
                f'<a class="menu-navigation__sections-item-link" '
                f'href="{e(_relative_href(doc.url, href), quote=True)}">'
                f"{e(href)}</a>"
            )
        out.append("</nav>")
    if doc.kind in ("category", "listing"):
        out.append('<div class="catalog">')
        for href in doc.out_links:
            out.append(
                f'<a class="product-item-link" '
                f'href="{e(_relative_href(doc.url, href), quote=True)}">'
                f"{e(href)}</a>"
            )
        out.append("</div>")
        if doc.page_labels:
            out.append('<div class="module-pagination">')
            for lbl in doc.page_labels:
                out.append(f'<a class="page-label">{e(lbl)}</a>')
            out.append("</div>")
    if doc.kind == "product" and doc.payload:
        p = doc.payload
        out.append(
            f'<div class="breadcrumbs">'
            f'<a class="breadcrumb-item">{e(p["category"])}</a></div>'
        )
        out.append(f'<h1 class="product-title">{e(p["name"])}</h1>')
        out.append(f'<span class="sku">{e(p["sku"])}</span>')
        out.append(f'<span class="price">{e(p["price_str"])}</span>')
        out.append(f'<span class="amount">{e(p["amount_str"])}</span>')
        out.append(f'<span class="units">{e(p["units"])}</span>')
        out.append(f'<div class="description">{e(p["description"])}</div>')
        if doc.variants_json is not None:
            # raw JSON (possibly pre-entity-escaped, S6) inside a script
            # block: script content is CDATA, so the parser receives it
            # byte-for-byte — exactly how the reference's site embeds
            # offer JSON (rusteaco.rs:275)
            out.append(
                '<script type="application/json" id="offers">'
                f"{doc.variants_json}</script>"
            )
    for im in doc.images:
        out.append(
            f'<img class="page-image" src="/img/{im["image_id"]}" '
            f'alt="{e(im["caption"], quote=True)}">'
        )
    out.append("</body></html>")
    return "\n".join(out)


def world_http_transport(world: SyntheticWorld):
    """Transport double: ``GET url -> bytes | None`` serving the world
    as HTML pages, image payloads and robots.txt.  Same signature as
    ``plans.http_fetch.real_http_transport()`` — tests inject it to
    drive the full HTTP fetch/parse path offline."""

    hosts = set(world.cfg.hosts())

    def get(url: str) -> bytes | None:
        s = urlsplit(url)
        host = s.netloc
        if host not in hosts:
            return None
        if s.path == "/robots.txt":
            txt = world.robots_txt(host)
            return txt.encode() if txt is not None else None
        if s.path.startswith("/img/"):
            image_id = s.path[len("/img/"):]
            # image bytes are derived purely from the id (worldgen.py)
            expected_host = image_id.split("-")[1] if "-" in image_id else ""
            if expected_host != host:
                return None
            return make_image_bytes(
                world.cfg.seed, image_id, world.cfg.image_sizes
            )
        doc = world.fetch(url)
        if doc is None:
            return None
        return render_page(doc).encode()

    return get
