"""Deterministic synthetic crawl world (replaces live HTTP).

The world is a pure function ``(config, url) -> PageDoc`` — both the Spark
``mapInPandas`` fetch stage and the pure-Python parity oracle call the same
function, so fetch results are identical by construction (no fixture files,
no network).  Mirrors the reference's 4-level site shape:

    seed page -> category links -> pagination expansion -> product links
    -> product pages (validated payload + variants + images)

Reference analogs (in /root/reference):
* site shape + per-site constants: SPEC.md:147-196 and the five crawler
  files (``src/crawlers/*.rs``); page params ``page``/``PAGEN_1``/``PAGEN_2``
  mirror ``wintergreen.rs:111-116`` / ``tea101.rs:108-113`` /
  ``rusteaco.rs:150-155``.
* politeness budgets 5/5/5/1/1: ``src/processing/crawler.rs:43-47``.
* messy payload strings ("0,5 кг", "1 099 ₽", "/100 г") exercise
  ``parse_amount_units`` (``src/crawlers/mod.rs:172-214``) and price cleanup
  (``src/crawlers/teanadin.rs:262-268``).
* ~2% invalid rows (empty sku/name) exercise ``build_new_product`` rejection
  (``src/crawlers/mod.rs:50-170``).
* variant explosion with ``url#sku`` on one host mirrors
  ``src/crawlers/rusteaco.rs:29-53``.
"""

from __future__ import annotations

import hashlib
import html
import json
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Optional

import numpy as np

from .lossy import encode_lossy
from .png import encode_png

# per-site page-query-param names, cycled across hosts (SPEC.md:147-196)
_PAGE_PARAMS = ("page", "PAGEN_1", "PAGEN_2")
# per-site politeness budgets, cycled (crawler.rs:43-47 semaphore sizes)
_BUDGETS = (5, 5, 5, 1, 1)
# last-page read rule, cycled: teanadin (4th site) reads the SECOND-TO-LAST
# pagination link because its block ends with a next-page arrow
# (teanadin.rs:95-99 `.rev().nth(1)`); everyone else reads the last link
_PAGE_RULES = ("last", "last", "last", "second_last", "last")

_UNITS_POOL = ("кг", "г", "л", "мл", "шт", "%")
_AMOUNT_TEMPLATES = (
    "{q} {u}",      # "0.5 кг"
    "{q}{u}",       # "100г"
    "/{q} {u}",     # "/100 г"  (leading slash stripped by parser)
    "{qc} {u}",     # comma decimal "1,5 л"
    "",             # -> default (1.0, "шт")
    "abc",          # -> default (1.0, "шт")
    "{q}",          # bare quantity -> (q, "шт")
)
_NAME_WORDS = (
    "чай", "зелёный", "чёрный", "улун", "пуэр", "матча", "жасмин",
    "цейлон", "ассам", "эрл", "грей", "молочный", "имбирь", "мята",
)
_CATEGORY_POOL = (
    "Чай / Зелёный", "Чай / Чёрный", "Чай / Улун", "Чай / Пуэр",
    "Посуда / Чайники", "Посуда / Пиалы", "Аксессуары",
)


@dataclass(frozen=True)
class WorldConfig:
    """Shape knobs for the synthetic world (FIXTURES.md §2)."""

    seed: int = 42
    n_hosts: int = 3
    hot_host_idx: int = 0        # this host gets hot_factor x categories (skew)
    hot_factor: int = 10
    categories_range: tuple[int, int] = (5, 8)
    pages_range: tuple[int, int] = (1, 4)
    links_per_page: tuple[int, int] = (10, 30)
    dup_fraction: float = 0.15   # cross-page duplicate product links
    invalid_fraction: float = 0.02
    variant_fraction: float = 0.20
    variant_host_idx: int = 1
    images_per_product: tuple[int, int] = (0, 2)
    image_sizes: tuple[int, ...] = (32, 48, 64)
    budget_scale: int = 1        # multiplies the 5/5/5/1/1 budgets
    robots_max_rules: int = 16   # exact-product disallow prefixes per host
    robots_fraction: float = 0.03

    def hosts(self) -> list[str]:
        return [f"site{k}.test" for k in range(self.n_hosts)]


def _rng(cfg: WorldConfig, *parts) -> np.random.Generator:
    """Seeded generator keyed on a stable hash of (seed, *parts)."""
    h = hashlib.blake2b(
        ("|".join(str(p) for p in (cfg.seed, *parts))).encode(), digest_size=8
    ).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(h, "big")))


@dataclass
class HostConfig:
    host: str
    idx: int
    n_categories: int
    page_param: str
    budget_per_round: int
    n_products: int              # product-id universe size
    robots_disallow: list[str] = field(default_factory=list)
    crawl_delay_ms: int = 0
    last_page_rule: str = "last"  # "last" | "second_last" (teanadin quirk)


@dataclass
class PageDoc:
    """One fetchable page. ``out_links`` are in document order."""

    url: str
    host: str
    kind: str                    # seed | category | listing | product
    depth: int
    out_links: list[str] = field(default_factory=list)
    last_page: int = 1           # ground truth (world-internal)
    # what the page's pagination block actually SHOWS: numeric labels,
    # plus a trailing next-arrow on second_last-rule hosts — consumers
    # must apply the per-site read rule (teanadin.rs:95-99), never
    # last_page directly
    page_labels: list[str] = field(default_factory=list)
    payload: Optional[dict] = None       # raw extraction strings (product)
    variants_json: Optional[str] = None  # JSON string (rusteaco-style)
    images: list[dict] = field(default_factory=list)  # {image_id, bytes, caption}


class SyntheticWorld:
    """Pure-function crawl world; all structure derived from the seed."""

    def __init__(self, cfg: WorldConfig | None = None):
        self.cfg = cfg or WorldConfig()
        self._host_cfgs = {h: self._build_host(h, i) for i, h in enumerate(self.cfg.hosts())}

    # ---- shape ----------------------------------------------------------

    def _build_host(self, host: str, idx: int) -> HostConfig:
        cfg = self.cfg
        r = _rng(cfg, "host", host)
        lo, hi = cfg.categories_range
        n_cat = int(r.integers(lo, hi + 1))
        if idx == cfg.hot_host_idx:
            n_cat *= cfg.hot_factor
        # expected link slots -> universe sized for ~dup_fraction collisions
        mean_pages = (cfg.pages_range[0] + cfg.pages_range[1]) / 2
        mean_links = (cfg.links_per_page[0] + cfg.links_per_page[1]) / 2
        slots = n_cat * mean_pages * mean_links
        n_products = max(10, int(slots * (1.0 - cfg.dup_fraction)))
        hc = HostConfig(
            host=host,
            idx=idx,
            n_categories=n_cat,
            page_param=_PAGE_PARAMS[idx % len(_PAGE_PARAMS)],
            budget_per_round=_BUDGETS[idx % len(_BUDGETS)] * cfg.budget_scale,
            n_products=n_products,
            last_page_rule=_PAGE_RULES[idx % len(_PAGE_RULES)],
        )
        n_rules = min(cfg.robots_max_rules, int(n_products * cfg.robots_fraction))
        if n_rules > 0:
            pids = r.choice(n_products, size=n_rules, replace=False)
            hc.robots_disallow = sorted(f"/p/{int(p):06d}" for p in pids)
        hc.crawl_delay_ms = int(r.choice([0, 100, 500]))
        return hc

    def host_config(self, host: str) -> HostConfig:
        return self._host_cfgs[host]

    def politeness_rows(self) -> list[dict]:
        return [
            {
                "host": hc.host,
                "budget_per_round": hc.budget_per_round,
                "robots_disallow": list(hc.robots_disallow),
                "crawl_delay_ms": hc.crawl_delay_ms,
            }
            for hc in self._host_cfgs.values()
        ]

    def seed_urls(self) -> list[str]:
        return [f"http://{h}/" for h in self.cfg.hosts()]

    def robots_txt(self, host: str) -> Optional[str]:
        """GET /robots.txt — the engine PARSES this (sectioned, with
        comments and a decoy agent section) instead of receiving rule
        lists out of band; a parser that ignored sectioning would block
        everything and fail parity loudly."""
        hc = self._host_cfgs.get(host)
        if hc is None:
            return None
        lines = ["# synthetic robots.txt", "User-agent: *"]
        lines += [f"Disallow: {p}" for p in hc.robots_disallow]
        lines.append("Disallow:")  # empty = allow-all, must be ignored
        if hc.crawl_delay_ms:
            lines.append(f"Crawl-delay: {hc.crawl_delay_ms / 1000:g}")
        lines += ["", "User-agent: badbot", "Disallow: /"]
        return "\n".join(lines) + "\n"

    # ---- url helpers -----------------------------------------------------

    def category_url(self, host: str, c: int) -> str:
        return f"http://{host}/cat/{c}"

    def listing_url(self, host: str, c: int, p: int) -> str:
        if p <= 1:
            return self.category_url(host, c)
        param = self._host_cfgs[host].page_param
        return f"http://{host}/cat/{c}?{param}={p}"

    def product_url(self, host: str, pid: int) -> str:
        return f"http://{host}/p/{pid:06d}"

    # ---- page generation -------------------------------------------------

    def _last_page(self, host: str, c: int) -> int:
        lo, hi = self.cfg.pages_range
        return int(_rng(self.cfg, "pages", host, c).integers(lo, hi + 1))

    def _listing_pids(self, host: str, c: int, p: int) -> list[int]:
        cfg, hc = self.cfg, self._host_cfgs[host]
        r = _rng(cfg, "listing", host, c, p)
        lo, hi = cfg.links_per_page
        n = int(r.integers(lo, hi + 1))
        return [int(x) for x in r.integers(0, hc.n_products, n)]

    def fetch(self, url: str) -> Optional[PageDoc]:
        """The 'HTTP GET': deterministic page for a URL, or None (404)."""
        try:
            rest = url.split("://", 1)[1]
        except IndexError:
            return None
        host, _, path_q = rest.partition("/")
        if host not in self._host_cfgs:
            return None
        hc = self._host_cfgs[host]
        path, _, query = path_q.partition("?")
        if path == "" or path == "/":
            links = [self.category_url(host, c) for c in range(hc.n_categories)]
            return PageDoc(url=url, host=host, kind="seed", depth=0, out_links=links)
        parts = path.split("/")
        if parts[0] == "cat" and len(parts) == 2:
            c = int(parts[1])
            if not (0 <= c < hc.n_categories):
                return None
            p = 1
            if query:
                for kv in query.split("&"):
                    k, _, v = kv.partition("=")
                    if k == hc.page_param and v.isdigit():
                        p = int(v)
            last = self._last_page(host, c)
            if not (1 <= p <= last):
                return None
            pids = self._listing_pids(host, c, p)
            links = [self.product_url(host, pid) for pid in pids]
            kind = "category" if p == 1 else "listing"
            images = []
            if kind == "category" and self.cfg.images_per_product[1] > 0:
                # ~half the category pages carry a banner image — the
                # non-leaf imagery that makes parent-scoped phash novelty
                # observable (product pages are leaves: their images can
                # never influence the priority of their own outlinks)
                rb = _rng(self.cfg, "banner", host, c)
                if float(rb.random()) < 0.5:
                    bid = f"img-{host}-cat{c:04d}-banner"
                    images.append({
                        "image_id": bid,
                        "bytes": make_image_bytes(self.cfg.seed, bid, self.cfg.image_sizes),
                        "caption": f"Category {c} banner / {host}",
                    })
            labels: list[str] = []
            if kind == "category" and last >= 2:
                labels = [str(n) for n in range(1, last + 1)]
                if hc.last_page_rule == "second_last":
                    labels.append("→")  # next-page arrow (teanadin.rs:95-99)
            return PageDoc(
                url=url, host=host, kind=kind, depth=1 if p == 1 else 2,
                out_links=links, last_page=last, page_labels=labels,
                images=images,
            )
        if parts[0] == "p" and len(parts) == 2:
            pid = int(parts[1])
            if not (0 <= pid < hc.n_products):
                return None
            return self._product_page(url, host, pid)
        return None

    def _product_page(self, url: str, host: str, pid: int) -> PageDoc:
        cfg = self.cfg
        hc = self._host_cfgs[host]
        r = _rng(cfg, "prod", host, pid)
        name = " ".join(_NAME_WORDS[int(i)] for i in r.integers(0, len(_NAME_WORDS), 3))
        sku = f"{host.split('.')[0].upper()}-{pid:06d}"
        invalid = float(r.random()) < cfg.invalid_fraction
        if invalid:
            # empty sku/name -> must be routed to rejects (mod.rs:50-170)
            if r.random() < 0.5:
                sku = ""
            else:
                name = "  "
        category = str(r.choice(_CATEGORY_POOL))
        q = float(r.choice([0.5, 1, 1.5, 100, 250, 500]))
        u = str(r.choice(_UNITS_POOL))
        tmpl = str(r.choice(_AMOUNT_TEMPLATES))
        qs = f"{q:g}"
        amount_str = tmpl.format(q=qs, qc=qs.replace(".", ","), u=u)
        price = float(np.round(r.uniform(50, 5000), 2))
        style = int(r.integers(0, 3))
        if style == 0:
            price_str = f"{price:.2f}".replace(".", ",")          # "1234,50"
        elif style == 1:
            price_str = f"{price:,.2f}".replace(",", " ").replace(".", ",")  # "1 234,50"
        else:
            price_str = f"{int(price)} ₽"               # "1099 ₽" with NBSP
        description = f"Описание товара {sku or pid}: {name}."
        payload = {
            "sku": sku,
            "name": name,
            "category": category,
            "units": u,
            "price_str": price_str,
            "amount_str": amount_str,
            "description": description,
        }
        variants_json = None
        if hc.idx == cfg.variant_host_idx and float(r.random()) < cfg.variant_fraction and not invalid:
            n_var = int(r.integers(2, 4))
            variants = [
                {
                    "sku": f"{sku}-V{j}",
                    "title": f"{float(r.choice([0.25, 0.5, 1.0])):g} кг",
                    "price": float(np.round(price * (1 + 0.25 * j), 2)),
                }
                for j in range(n_var)
            ]
            variants_json = json.dumps(variants, ensure_ascii=False)
            if float(r.random()) < 0.5:
                # S6: half the embedded product JSON arrives HTML-entity-
                # escaped, as on the reference's site (rusteaco.rs:275) —
                # consumers must entity-decode before parsing
                variants_json = html.escape(variants_json, quote=True)
        images = []
        if not invalid:
            lo, hi = cfg.images_per_product
            n_img = int(r.integers(lo, hi + 1))
            for k in range(n_img):
                image_id = f"img-{host}-{pid:06d}-{k}"
                images.append(
                    {
                        "image_id": image_id,
                        "bytes": make_image_bytes(cfg.seed, image_id, cfg.image_sizes),
                        "caption": build_caption(payload),
                    }
                )
        return PageDoc(
            url=url, host=host, kind="product", depth=3,
            payload=payload, variants_json=variants_json, images=images,
        )


def build_caption(payload: dict) -> str:
    """7-field newline-joined prompt, mirroring the reference's embedding
    prompt template (src/processing/embedding.rs:11-23, golden test at
    src/processing/benchmark.rs:198-212)."""
    return (
        f"Name: {payload['name']}\n"
        f"SKU: {payload['sku']}\n"
        f"Category: {payload['category']}\n"
        f"Units: {payload['units']}\n"
        f"Price: {payload['price_str']}\n"
        f"Amount: {payload['amount_str']}\n"
        f"Description: {payload['description']}"
    )


@lru_cache(maxsize=4096)
def make_image_pixels(seed: int, image_id: str, sizes: tuple[int, ...]) -> np.ndarray:
    """Deterministic RGB pixels for an image_id: gradient + seeded noise."""
    r = _rng(WorldConfig(seed=seed), "img", image_id)
    w = int(r.choice(list(sizes)))
    h = int(r.choice(list(sizes)))
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int32)
    noise = r.integers(-24, 25, size=(h, w, 3), dtype=np.int32)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def image_fmt(seed: int, image_id: str) -> str:
    """Deterministic format mix: ~1/3 of images are lossy ('jpg' — the
    LJQ1 DCT-quantized stand-in codec), the rest lossless PNG. A 100 TB
    web image corpus is mostly lossy, so the engine's decode path and the
    PSNR>=40dB parity invariant (input_hint) are exercised by default."""
    r = _rng(WorldConfig(seed=seed), "imgfmt", image_id)
    return "jpg" if float(r.random()) < (1.0 / 3.0) else "png"


def make_image_bytes(seed: int, image_id: str, sizes: tuple[int, ...],
                     fmt: str | None = None) -> bytes:
    """Encoded payload for an image_id; fmt=None picks the deterministic
    world mix (see :func:`image_fmt`)."""
    px = make_image_pixels(seed, image_id, sizes)
    f = fmt or image_fmt(seed, image_id)
    return encode_lossy(px) if f in ("jpg", "jpeg") else encode_png(px)
