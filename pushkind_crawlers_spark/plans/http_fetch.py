"""Production HTTP fetch stage (VERDICT r03 missing #3).

The crawl engine's fetch seam is a ``mapInPandas`` function over frontier
rows (``plans/crawl.py`` ``make_world_fetch_fn``).  This module provides
the production instance of that seam:

* :func:`real_http_transport` — ``GET url -> bytes | None`` over stdlib
  urllib: timeout, bounded retry with backoff on 5xx/connection errors,
  non-2xx -> ``None`` exactly like the reference's ``fetch_html``
  (/root/reference/src/crawlers/wintergreen.rs:44-53).  No third-party
  dependency; ``requests`` would slot into the same factory.
* :func:`parse_site_html` — the site-rule parser (stdlib
  ``html.parser``), the analog of the reference's per-site ``scraper``
  Selector rules (wintergreen.rs:66,90; rusteaco.rs:275), producing the
  same parsed-page fields the synthetic world fetch emits.
* :func:`make_http_fetch_fn` — the Arrow-batched fetch stage: one GET
  per frontier row plus one GET per discovered image, same ``FETCHED``
  output schema as the world fetch, so the engine is oblivious to which
  fetcher runs.

Transports are injectable (a zero-arg factory resolved inside the
worker) so tests drive the full fetch/parse path with
``synth.htmlgen.world_http_transport`` and no network.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator, Optional
from urllib.parse import urlsplit

import pandas as pd

from .. import schemas
from .site_rules import SYNTHETIC_RULES, parse_with_rules

_FETCHED_COLS = [f.name for f in schemas.FETCHED.fields]

#: the engine's UA string (S5 — the reference pins one UA constant for
#: every request, src/crawlers/mod.rs ``build_reqwest_client``)
USER_AGENT = "pushkind-crawlers-spark/1.0 (+https://github.com/pushkindt)"


def real_http_transport(
    timeout: float = 10.0,
    retries: int = 2,
    backoff_s: float = 0.5,
    user_agent: str = USER_AGENT,
    url_rewrite: Optional[Callable[[str], str]] = None,
):
    """``GET url -> bytes | None`` over urllib.

    * non-2xx -> None (logged-and-skipped in the reference,
      wintergreen.rs:49-52) — 4xx never retries, 5xx retries with
      exponential backoff up to ``retries`` times;
    * connection errors / timeouts retry the same way;
    * only http/https targets are fetched — urllib's urlopen would
      happily read ``file://`` / ``ftp://``, and link/image URLs are
      page-controlled, so any other scheme returns None (SSRF guard);
    * ``url_rewrite`` maps the logical URL to the wire URL (test
      servers, forward proxies) without the engine seeing it.
    """
    import urllib.error
    import urllib.request

    def get(url: str) -> bytes | None:
        target = url_rewrite(url) if url_rewrite is not None else url
        if urlsplit(target).scheme not in ("http", "https"):
            return None
        req = urllib.request.Request(target, headers={"User-Agent": user_agent})
        for attempt in range(retries + 1):
            try:
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    return resp.read()
            except urllib.error.HTTPError as err:
                if 500 <= err.code < 600 and attempt < retries:
                    time.sleep(backoff_s * (2 ** attempt))
                    continue
                return None
            except (urllib.error.URLError, TimeoutError, OSError):
                if attempt < retries:
                    time.sleep(backoff_s * (2 ** attempt))
                    continue
                return None
        return None

    return get


def http_robots_txt_fn(transport_factory=real_http_transport):
    """``host -> robots.txt text | None`` through the same transport
    seam (the engine treats robots as just another fetch)."""

    def robots(host: str) -> str | None:
        data = transport_factory()(f"http://{host}/robots.txt")
        return data.decode("utf-8", errors="replace") if data is not None else None

    return robots


# --------------------------------------------------------------- site rules

# The per-site selector matrices (the five reference stores + the
# synthetic template) live in plans/site_rules.py as DATA interpreted
# by one streaming parser — the analog of the reference registering one
# crawler impl per site (src/crawlers/mod.rs).


def parse_site_html(page_url: str, text: str) -> dict | None:
    """Parse one synthetic-template page into the engine's fetched-row
    fields (the production parser under ``SYNTHETIC_RULES``).

    Returns None when the document carries no recognizable template
    (no ``kind`` marker) — the fetch row lands ``ok=False`` exactly
    like a 404.  For the five real stores use
    ``site_rules.make_site_parse_fn(SITE_RULES[site])`` or the
    host-dispatched ``make_multi_site_parse_fn()``.
    """
    return parse_with_rules(SYNTHETIC_RULES, page_url, text)


# ------------------------------------------------------------- fetch stage

def make_http_fetch_fn(
    transport_factory=real_http_transport,
    parse_fn=parse_site_html,
    same_host_images: bool = True,
) -> Callable:
    """mapInPandas fetch stage over a live transport.

    Same input/output contract as ``make_world_fetch_fn``
    (plans/crawl.py): frontier rows in, ``schemas.FETCHED`` rows out.
    The transport is resolved once per task from ``transport_factory``
    (a real transport caches its connection state module-side); page
    images are fetched through the same transport, so the politeness
    budget's per-host round cap covers them implicitly (images are
    same-host in every reference webstore).  With ``same_host_images``
    (the default) an image src pointing off the page's host is skipped —
    image URLs are page-controlled, and the per-host budget accounting
    assumes same-host fetches.
    """

    def fetch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()
        for pdf in batches:
            rows = []
            for url_hash, url, host, depth, ordv in zip(
                pdf["url_hash"], pdf["url"], pdf["host"], pdf["depth"], pdf["ord"]
            ):
                base = {
                    "url_hash": url_hash, "url": url, "host": host,
                    "depth": int(depth), "ord": ordv, "ok": False, "kind": None,
                    "last_page": None, "page_labels": None, "out_links": None,
                    "sku": None, "name": None, "category": None,
                    "units_raw": None, "price_str": None, "amount_str": None,
                    "description": None, "variants_json": None, "images": None,
                }
                data = transport(url)
                if data is not None:
                    parsed = parse_fn(url, data.decode("utf-8", errors="replace"))
                    if parsed is not None:
                        imgs = []
                        for im in parsed["images"]:
                            if same_host_images and urlsplit(im["src"]).netloc != host:
                                continue
                            blob = transport(im["src"])
                            if blob is not None:
                                imgs.append({
                                    "image_id": im["image_id"],
                                    "bytes": blob,
                                    "caption": im["caption"],
                                })
                        base.update(
                            ok=True,
                            kind=parsed["kind"],
                            page_labels=parsed["page_labels"] or None,
                            out_links=parsed["out_links"],
                            sku=parsed["sku"], name=parsed["name"],
                            category=parsed["category"],
                            units_raw=parsed["units_raw"],
                            price_str=parsed["price_str"],
                            amount_str=parsed["amount_str"],
                            description=parsed["description"],
                            variants_json=parsed["variants_json"],
                            images=imgs or None,
                        )
                rows.append(base)
            yield pd.DataFrame(rows, columns=_FETCHED_COLS)

    return fetch_fn
