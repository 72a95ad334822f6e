"""Fixture-served replicas of the five reference stores' HTML shapes.

Each fixture is a tiny deterministic site (menu → category → paged
listing → product pages) rendered with that store's REAL markup — the
exact element/class structure the reference's selectors target
(``/root/reference/src/crawlers/*.rs``; rule tables in
``plans/site_rules.py``).  Product fields deliberately contain nested
inline markup (``<b>``, ``<span>``) so tests pin the full-descendant
text semantics of the rule parser (``el.text().collect()`` in the
reference), which the pre-round-5 parser got wrong.

``fixture_transport`` is a ``GET url -> bytes | None`` double with the
same signature as ``plans.http_fetch.real_http_transport()`` — tests
inject it to drive the production fetch/parse stage offline, per site.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..plans.site_rules import SITE_RULES, SiteRules
from .worldgen import make_image_bytes


@dataclass
class FixtureSite:
    rules: SiteRules
    pages: dict = field(default_factory=dict)    # url -> html str
    images: dict = field(default_factory=dict)   # url -> payload bytes
    expect: dict = field(default_factory=dict)   # product url -> expected fields
    menu_url: str = ""
    category_url: str = ""
    page2_url: str = ""
    product_urls: list = field(default_factory=list)


def _menu_html(site: str, hrefs: list[str]) -> str:
    links = "".join(f'<a class="header-link" href="{h}">s</a>' for h in hrefs)
    if site == "wintergreen":
        links = "".join(
            f'<a class="menu-navigation__sections-item-link" href="{h}">Чай</a>'
            for h in hrefs
        )
        return f"<html><body><nav>{links}</nav></body></html>"
    if site == "gutenberg":
        items = "".join(f'<li><a href="{h}">Чай</a></li>' for h in hrefs)
        return f'<html><body><ul class="menu-type-1">{items}</ul></body></html>'
    if site == "101tea":
        links = "".join(
            f'<a class="catalog-nav__link" href="{h}">Чай</a>' for h in hrefs
        )
        return f"<html><body><div>{links}</div></body></html>"
    if site == "rusteaco":
        links = "".join(
            f'<a class="header__collections-link" href="{h}">Чай</a>' for h in hrefs
        )
        return f"<html><body><header>{links}</header></body></html>"
    if site == "teanadin":
        items = "".join(f'<li><a href="{h}">Чай</a></li>' for h in hrefs)
        return (
            f'<html><body><ul class="header-menu__wide-submenu">{items}</ul>'
            f"</body></html>"
        )
    raise KeyError(site)


#: per-site markup a LIVE listing page carries that also matches the
#: site's name/price selectors (bare h1 headings, price-classed elements
#: inside product cards) — present in the fixtures so the kind inference
#: is pinned against misclassifying listings as products (r05 ADVICE:
#: that misclassification stalls the crawl after the seed, and fixtures
#: without this markup could not catch it)
_LISTING_DECOY = {
    "wintergreen": '<h1>Каталог</h1><div class="price">100 ₽</div>',
    "gutenberg": '<h1 id="pagetitle">Каталог</h1><span class="price_value">100</span>',
    "101tea": '<h1>Каталог</h1><span class="js-price-val">100</span>',
    "rusteaco": '<h1 class="product__title">Каталог</h1>'
                '<span class="product__price-cur">100</span>',
    "teanadin": '<h1 class="switcher-title">Каталог</h1>'
                '<span class="price__new-val">100</span>',
}


def _listing_html(site: str, product_hrefs: list[str], labels: list[str]) -> str:
    if site == "wintergreen" or site == "gutenberg":
        items = "".join(
            f'<div class="item-title"><a href="{h}">p</a></div>' for h in product_hrefs
        )
    elif site == "101tea":
        items = "".join(
            f'<div class="product-card__info-bottom"><a href="{h}">p</a></div>'
            for h in product_hrefs
        )
    elif site == "rusteaco":
        items = "".join(
            f'<div class="product-preview__title"><a href="{h}">p</a></div>'
            for h in product_hrefs
        )
    elif site == "teanadin":
        items = "".join(
            f'<div class="catalog-block__info-title"><a href="{h}">p</a></div>'
            for h in product_hrefs
        )
    else:
        raise KeyError(site)

    if not labels:
        pag = ""
    elif site == "wintergreen":
        # bare <a> children of the pagination block (wintergreen.rs:88-95)
        pag = '<div class="module-pagination">' + "".join(
            f"<a>{x}</a>" for x in labels
        ) + "</div>"
    elif site in ("gutenberg", "teanadin"):
        pag = '<div class="module-pagination"><div class="nums">' + "".join(
            f"<a>{x}</a>" for x in labels
        ) + "</div></div>"
    elif site == "101tea":
        pag = '<div class="pagination">' + "".join(
            f'<a class="pagination-links">{x}</a>' for x in labels
        ) + "</div>"
    else:  # rusteaco
        pag = '<div class="pagination-items">' + "".join(
            f'<a class="pagination-link">{x}</a>' for x in labels
        ) + "</div>"
    decoy = _LISTING_DECOY[site]
    return f"<html><body>{decoy}<div>{items}</div>{pag}</body></html>"


def _crumbs(site: str, names: list[str]) -> str:
    if site == "101tea":
        return "".join(f'<a class="breadcrumbs__list-link">{n}</a>' for n in names)
    if site == "rusteaco":
        items = "".join(f'<li><a href="#">{n}</a></li>' for n in names)
        return f'<ul class="breadcrumb">{items}</ul>'
    return "".join(f'<a class="breadcrumbs__link">{n}</a>' for n in names)


# expected parse output fields are keyed the engine way:
#   name sku price_str amount_str units_raw description category
#   images (list of absolute urls) variants_json

def _product_html(site: str, i: int):
    """(html, expected-fields) for product #i of a site."""
    crumbs = _crumbs(site, ["Главная", "Чай"])
    cat = "Главная / Чай"
    if site == "wintergreen":
        html = f"""<html><body>{crumbs}
<h1>Молочный <b>улун</b> №{i}</h1>
<div class="price">1 <span>89{i}</span>&nbsp;₽</div>
<span class="article__value">WG-00{i}</span>
<span class="js-product-calc-value">250</span>
<span class="product-card__calculus-unit">г</span>
<div class="detail-text-wrap">Описание <i>молочного</i> улуна</div>
<img class="product-detail-gallery__picture" data-src="/upload/wg{i}.jpg" alt="Молочный улун">
</body></html>"""
        exp = {
            "name": f"Молочный улун №{i}", "sku": f"WG-00{i}",
            "price_str": f"1 89{i}\xa0₽", "amount_str": "250",
            "units_raw": "г", "description": "Описание молочного улуна",
            "category": cat, "variants_json": None,
            "images": [f"http://wintergreen.ru/upload/wg{i}.jpg"],
        }
    elif site == "gutenberg":
        html = f"""<html><body>{crumbs}
<h1 id="pagetitle">Ассам <b>GFOP</b> №{i}</h1>
<div itemprop="description">Крепкий <b>индийский</b> чай</div>
<span class="article__value">GB-{i}0</span>
<span class="price_value">54{i}</span>
<span class="price_measure">150 г</span>
</body></html>"""
        exp = {
            "name": f"Ассам GFOP №{i}", "sku": f"GB-{i}0",
            "price_str": f"54{i}", "amount_str": "150 г",
            "units_raw": None, "description": "Крепкий индийский чай",
            "category": cat, "variants_json": None, "images": [],
        }
    elif site == "101tea":
        html = f"""<html><body>{crumbs}
<h1>Те Гуань <i>Инь</i> №{i}</h1>
<div class="product_art"><span>Артикул:</span><span>T-10{i}</span></div>
<span class="js-price-val">1 25{i}</span>
<span class="js-product-calc-value">100</span>
<span class="product-card__calculus-unit">г</span>
<div class="catalog-table_content-item_about_product">Улун <b>анси</b></div>
</body></html>"""
        exp = {
            "name": f"Те Гуань Инь №{i}", "sku": f"T-10{i}",
            "price_str": f"1 25{i}", "amount_str": "100",
            "units_raw": "г", "description": "Улун анси",
            "category": cat, "variants_json": None, "images": [],
        }
    elif site == "rusteaco":
        if i == 1:
            # the data-product-json variant path (rusteaco.rs:273-291) —
            # attribute arrives HTML-entity-escaped in the document
            html = f"""<html><body>{crumbs}
<h1 class="product__title">Да Хун <b>Пао</b></h1>
<div class="product__short-description">Утёсный улун</div>
<form class="product" data-product-json="{{&quot;variants&quot;:[{{&quot;sku&quot;:&quot;R-1a&quot;,&quot;price&quot;:950.0,&quot;title&quot;:&quot;50 г&quot;}},{{&quot;sku&quot;:&quot;R-1b&quot;,&quot;price&quot;:1800.0,&quot;title&quot;:&quot;100 г&quot;}}]}}"></form>
</body></html>"""
            exp = {
                "name": "Да Хун Пао", "sku": None, "price_str": None,
                "amount_str": None, "units_raw": None,
                "description": "Утёсный улун", "category": cat,
                "variants_json": '{"variants":[{"sku":"R-1a","price":950.0,'
                                 '"title":"50 г"},{"sku":"R-1b","price":1800.0,'
                                 '"title":"100 г"}]}',
                "images": [],
            }
        else:
            html = f"""<html><body>{crumbs}
<h1 class="product__title">Сенча №{i}</h1>
<div class="product__short-description">Японский чай</div>
<span class="sku-value">R-{i}</span>
<button class="option-value">/50 г</button>
<span class="product__price-cur">67{i}</span>
</body></html>"""
            exp = {
                "name": f"Сенча №{i}", "sku": f"R-{i}",
                "price_str": f"67{i}", "amount_str": "/50 г",
                "units_raw": None, "description": "Японский чай",
                "category": cat, "variants_json": None, "images": [],
            }
    elif site == "teanadin":
        html = f"""<html><body>{crumbs}
<h1 class="switcher-title">Пуэр <b>шу</b> №{i}</h1>
<div itemprop="description">Выдержанный пуэр</div>
<span class="js-replace-article">TN-{i}</span>
<span class="price__new-val">99{i}</span>
<span class="sku-props__js-size">/100 г</span>
<img class="detail-gallery-big__picture" data-src="/upload/tn{i}.jpg" alt="Пуэр">
</body></html>"""
        exp = {
            "name": f"Пуэр шу №{i}", "sku": f"TN-{i}",
            "price_str": f"99{i}", "amount_str": "/100 г",
            "units_raw": None, "description": "Выдержанный пуэр",
            "category": cat, "variants_json": None,
            "images": [f"http://teanadin.ru/upload/tn{i}.jpg"],
        }
    else:
        raise KeyError(site)
    return html, exp


def build_fixture(site: str) -> FixtureSite:
    rules = SITE_RULES[site]
    host = rules.host
    base = f"http://{host}"
    fx = FixtureSite(rules=rules)
    fx.menu_url = f"{base}/"
    fx.category_url = f"{base}/catalog/tea/"
    fx.page2_url = f"{base}/catalog/tea/?{rules.page_param}=2"
    fx.product_urls = [f"{base}/catalog/tea/p{i}/" for i in (1, 2)]

    fx.pages[fx.menu_url] = _menu_html(site, ["/catalog/tea/"])
    # teanadin's pagination carries a trailing next-arrow link — the
    # reason its last-page read is second-to-last (teanadin.rs:95-99)
    labels = ["1", "2", "→"] if rules.last_page_rule == "second_last" else ["1", "2"]
    fx.pages[fx.category_url] = _listing_html(
        site, [f"/catalog/tea/p{i}/" for i in (1, 2)], labels
    )
    fx.pages[fx.page2_url] = _listing_html(site, ["/catalog/tea/p2/"], labels)
    for i, url in zip((1, 2), fx.product_urls):
        html, exp = _product_html(site, i)
        fx.pages[url] = html
        fx.expect[url] = exp
        for img_url in exp["images"]:
            # real decodable PNG bytes — the engine decodes stored images
            # for phash novelty, so a fixture image must be a real image
            fx.images[img_url] = make_image_bytes(
                seed=13, image_id=img_url.rsplit("/", 1)[-1],
                sizes=(32,), fmt="png")
    return fx


def fixture_transport(fx: FixtureSite):
    """``GET url -> bytes | None`` over a :class:`FixtureSite`."""

    def get(url: str) -> bytes | None:
        if url in fx.images:
            return fx.images[url]
        page = fx.pages.get(url)
        return page.encode() if page is not None else None

    return get
