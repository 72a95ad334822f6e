"""Per-site extraction rule tables + a streaming selector parser.

The reference ships five crawler impls that differ only in constants —
CSS selector sets, page param, last-page read rule (SURVEY §2.6;
``/root/reference/src/crawlers/{wintergreen,gutenberg,tea101,rusteaco,
teanadin}.rs``).  This module models that as DATA: a :class:`SiteRules`
row per store, interpreted by one generic streaming parser
(:class:`RuleParser`), so adding a sixth store is a table entry, not a
code path.  The synthetic test template is itself just another entry
(``SYNTHETIC_RULES``), which keeps the production parser and the test
parser the same code.

Selector support is the subset the five stores actually use
(wintergreen.rs:65-278, gutenberg.rs:66-246, tea101.rs:62-259,
rusteaco.rs:104-311, teanadin.rs:66-251):

* tag / ``.class`` / ``#id`` / ``[attr]`` / ``[attr='value']`` /
  ``:nth-child(n)`` simple selectors,
* descendant (whitespace) and child (``>``) combinators.

Matching is done against the open-element stack during one
``html.parser`` streaming pass — no DOM is built, so a page parse is
O(bytes) with a tiny constant, which is what you want inside an
Arrow-batched fetch stage.

Text extraction follows the reference's ``el.text().collect::<String>()``
— ALL descendant text of the matched element, so nested markup like
``<span class="price">1<b>2</b>3</span>`` yields ``"123"`` (the round-4
advice found the previous parser truncated at the first nested end tag).
Single-valued fields take the FIRST match (``select().next()``);
``many`` fields (breadcrumbs, pagination, images, links) take all
matches in document order.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Callable, Optional
from urllib.parse import urlsplit

from ..functions.urlnorm import absolutize

# ------------------------------------------------------------ selectors

#: HTML void elements: starttag only, never pushed on the open stack
_VOID = frozenset(
    "area base br col embed hr img input link meta source track wbr".split()
)

_SIMPLE_RE = re.compile(
    r"(?:\.(?P<cls>[\w-]+))"
    r"|(?:#(?P<id>[\w-]+))"
    r"|(?:\[(?P<an>[\w-]+)(?:=(?:'(?P<v1>[^']*)'|\"(?P<v2>[^\"]*)\"))?\])"
    r"|(?::nth-child\((?P<nth>\d+)\))"
)


@dataclass(frozen=True)
class _Simple:
    tag: Optional[str]
    id: Optional[str]
    classes: frozenset
    attrs: tuple  # ((name, value-or-None), ...) — None means "present"
    nth_child: Optional[int]


@dataclass(frozen=True)
class _Compiled:
    simples: tuple  # (_Simple, ...)
    combs: tuple    # (' '|'>', ...) between simples[i] and simples[i+1]


def _parse_simple(tok: str) -> _Simple:
    m = re.match(r"^([a-zA-Z][\w-]*)?", tok)
    tag = m.group(1)
    classes, sid, attrs, nth = [], None, [], None
    pos = m.end()
    for piece in _SIMPLE_RE.finditer(tok, pos):
        if piece.start() != pos:
            break
        pos = piece.end()
        if piece.group("cls"):
            classes.append(piece.group("cls"))
        elif piece.group("id"):
            sid = piece.group("id")
        elif piece.group("an"):
            val = piece.group("v1") if piece.group("v1") is not None else piece.group("v2")
            attrs.append((piece.group("an"), val))
        elif piece.group("nth"):
            nth = int(piece.group("nth"))
    if pos != len(tok):
        raise ValueError(f"unsupported selector syntax {tok[pos:]!r} in {tok!r}")
    return _Simple(tag, sid, frozenset(classes), tuple(attrs), nth)


def compile_selector(sel: str) -> _Compiled:
    """Compile a selector string; raises ValueError on unsupported syntax."""
    toks = sel.replace(">", " > ").split()
    simples, combs, pending = [], [], " "
    for tok in toks:
        if tok == ">":
            pending = ">"
            continue
        if simples:
            combs.append(pending)
        simple = _parse_simple(tok)
        if simple == _Simple(None, None, frozenset(), (), None):
            raise ValueError(f"unsupported selector token {tok!r} in {sel!r}")
        simples.append(simple)
        pending = " "
    if not simples:
        raise ValueError(f"empty selector {sel!r}")
    return _Compiled(tuple(simples), tuple(combs))


class _Frame:
    """One open element on the parse stack."""

    __slots__ = ("tag", "id", "classes", "attrs", "child_idx", "n_children")

    def __init__(self, tag, attrs, child_idx):
        self.tag = tag
        self.attrs = attrs
        self.id = attrs.get("id")
        self.classes = frozenset((attrs.get("class") or "").split())
        self.child_idx = child_idx  # 1-based index among parent's element children
        self.n_children = 0


def _match_simple(s: _Simple, f: _Frame) -> bool:
    if s.tag is not None and s.tag != f.tag:
        return False
    if s.id is not None and s.id != f.id:
        return False
    if not s.classes <= f.classes:
        return False
    for name, val in s.attrs:
        if name not in f.attrs:
            return False
        if val is not None and f.attrs[name] != val:
            return False
    if s.nth_child is not None and s.nth_child != f.child_idx:
        return False
    return True


def _match_from(c: _Compiled, si: int, path, pi: int) -> bool:
    if not _match_simple(c.simples[si], path[pi]):
        return False
    if si == 0:
        return True
    if c.combs[si - 1] == ">":
        return pi > 0 and _match_from(c, si - 1, path, pi - 1)
    return any(_match_from(c, si - 1, path, j) for j in range(pi - 1, -1, -1))


def sel_matches(c: _Compiled, path) -> bool:
    """True when the element at the top of ``path`` matches ``c``."""
    return bool(path) and _match_from(c, len(c.simples) - 1, path, len(path) - 1)


# ------------------------------------------------------------ rule tables

@dataclass(frozen=True)
class FieldRule:
    """How to extract one output field: selector + source.

    ``attr=None`` captures descendant text; otherwise the named
    attribute at the matched start tag.  ``many`` collects all matches
    (joined with ``join`` for text fields).
    """

    selector: str
    attr: Optional[str] = None
    many: bool = False
    join: str = " / "


@dataclass(frozen=True)
class SiteRules:
    """One store's extraction constants (SURVEY §2.6 row)."""

    site: str
    host: str
    page_param: str            # pagination query param the site uses
    last_page_rule: str        # 'last' | 'second_last' (teanadin.rs:95-99)
    concurrency: int           # reference per-site fetch concurrency
    section_links: Optional[FieldRule]      # menu → category links (href)
    product_links: Optional[FieldRule]      # listing → product links (href)
    pagination_labels: Optional[FieldRule]  # pagination <a> text labels
    # text fields keyed by engine output name:
    #   name sku price_str amount_str units_raw description
    text_fields: dict = field(default_factory=dict)
    category: Optional[FieldRule] = None    # many=True breadcrumbs, joined
    images: Optional[FieldRule] = None      # attr carries the image URL
    variants: Optional[FieldRule] = None    # attr=None → element text (script)
    strip_text: bool = True                 # reference .trim()s real-site text
    kind_rule: str = "infer"                # 'infer' | 'body-class'
    #: how the site expresses quantity (SURVEY §2.6 "Amount source"):
    #: 'combined' = one string like "150 г" through parse_amount_units
    #: (gutenberg/rusteaco/teanadin, gutenberg.rs:246-253); 'spans' =
    #: separate numeric + units elements, amount parsed as a plain
    #: number and units taken verbatim (wintergreen.rs:253-274,
    #: tea101.rs:251-272)
    amount_source: str = "combined"


def _tf(**kw) -> dict:
    return {k: (FieldRule(v) if isinstance(v, str) else v) for k, v in kw.items()}


#: The five reference stores.  Every selector string is lifted verbatim
#: from the reference's ``Selector::parse`` calls (citations per entry).
SITE_RULES = {
    # wintergreen.rs:33 base; 65 menu; 88-95 pagination; 141 product links;
    # 205-285 fields; images data-src 276-285; PAGEN_1 111-116; concurrency
    # crawler.rs:47
    "wintergreen": SiteRules(
        site="wintergreen", host="wintergreen.ru",
        page_param="PAGEN_1", last_page_rule="last", concurrency=1,
        section_links=FieldRule("a.menu-navigation__sections-item-link", attr="href", many=True),
        product_links=FieldRule("div.item-title > a", attr="href", many=True),
        pagination_labels=FieldRule("div.module-pagination a", many=True),
        text_fields=_tf(
            name="h1", description="div.detail-text-wrap",
            price_str="div.price", sku="span.article__value",
            units_raw="span.product-card__calculus-unit",
            amount_str="span.js-product-calc-value",
        ),
        category=FieldRule("a.breadcrumbs__link", many=True),
        images=FieldRule("img.product-detail-gallery__picture", attr="data-src", many=True),
        amount_source="spans",
    ),
    # gutenberg.rs:34 base; 66 menu; 89-95 pagination (div.nums > a);
    # 142 product links; 206-253 fields (combined amount+units in
    # span.price_measure → parse_amount_units); page param `page` 112-117
    "gutenberg": SiteRules(
        site="gutenberg", host="gutenberg.ru",
        page_param="page", last_page_rule="last", concurrency=5,
        section_links=FieldRule("ul.menu-type-1 li a", attr="href", many=True),
        product_links=FieldRule("div.item-title > a", attr="href", many=True),
        pagination_labels=FieldRule("div.module-pagination div.nums > a", many=True),
        text_fields=_tf(
            name="h1#pagetitle", description="div[itemprop='description']",
            sku="span.article__value", price_str="span.price_value",
            amount_str="span.price_measure",  # combined "150 г" (S2 parses)
        ),
        category=FieldRule("a.breadcrumbs__link", many=True),
    ),
    # tea101.rs base 101tea.ru; 62 menu; 85-91 pagination; 138 product
    # links; 202-272 fields (sku via :nth-child(2) 243); PAGEN_1 108-113
    "101tea": SiteRules(
        site="101tea", host="101tea.ru",
        page_param="PAGEN_1", last_page_rule="last", concurrency=5,
        section_links=FieldRule("a.catalog-nav__link", attr="href", many=True),
        product_links=FieldRule("div.product-card__info-bottom > a", attr="href", many=True),
        pagination_labels=FieldRule("div.pagination a.pagination-links", many=True),
        text_fields=_tf(
            name="h1", description="div.catalog-table_content-item_about_product",
            price_str="span.js-price-val",
            sku="div.product_art span:nth-child(2)",
            units_raw="span.product-card__calculus-unit",
            amount_str="span.js-product-calc-value",
        ),
        category=FieldRule("a.breadcrumbs__list-link", many=True),
        amount_source="spans",
    ),
    # rusteaco.rs:72 base; 104 menu; 127-133 pagination; 180 product
    # links; 244-311 fields; variants JSON in form.product
    # [data-product-json] 267-291 (entity-decoded then serde-parsed);
    # fallback sku/amount/price 294-317; page param `page` 150-155
    "rusteaco": SiteRules(
        site="rusteaco", host="shop.rusteaco.ru",
        page_param="page", last_page_rule="last", concurrency=5,
        section_links=FieldRule("a.header__collections-link", attr="href", many=True),
        product_links=FieldRule("div.product-preview__title > a", attr="href", many=True),
        pagination_labels=FieldRule("div.pagination-items a.pagination-link", many=True),
        text_fields=_tf(
            name="h1.product__title", description="div.product__short-description",
            sku="span.sku-value",
            amount_str="button.option-value",  # combined "150 г" (S2 parses)
            price_str="span.product__price-cur",
        ),
        category=FieldRule("ul.breadcrumb li a", many=True),
        variants=FieldRule("form.product", attr="data-product-json"),
    ),
    # teanadin.rs:34 base; 66 menu; 89 pagination (second-to-last rule
    # 95-99); 138 product links; 202-260 fields; images data-src 251-260;
    # PAGEN_2 108-113; concurrency crawler.rs:46
    "teanadin": SiteRules(
        site="teanadin", host="teanadin.ru",
        page_param="PAGEN_2", last_page_rule="second_last", concurrency=1,
        section_links=FieldRule("ul.header-menu__wide-submenu li a", attr="href", many=True),
        product_links=FieldRule("div.catalog-block__info-title > a", attr="href", many=True),
        pagination_labels=FieldRule("div.module-pagination div.nums > a", many=True),
        text_fields=_tf(
            name="h1.switcher-title", description="div[itemprop='description']",
            sku="span.js-replace-article", price_str="span.price__new-val",
            amount_str="span.sku-props__js-size",  # combined "/100 г" (S2)
        ),
        category=FieldRule("a.breadcrumbs__link", many=True),
        images=FieldRule("img.detail-gallery-big__picture", attr="data-src", many=True),
    ),
}

#: The synthetic world's template (synth/htmlgen.py) as a rules row —
#: the engine's test parser is the production parser with this entry.
#: strip_text=False: whitespace-only names must reach the validation
#: gate verbatim (mod.rs:50-170).
SYNTHETIC_RULES = SiteRules(
    site="synthetic", host="*",
    page_param="page", last_page_rule="last", concurrency=1,
    section_links=FieldRule("a.menu-navigation__sections-item-link", attr="href", many=True),
    product_links=FieldRule("a.product-item-link", attr="href", many=True),
    pagination_labels=FieldRule("a.page-label", many=True),
    text_fields=_tf(
        name=".product-title", sku=".sku", price_str=".price",
        amount_str=".amount", units_raw=".units", description=".description",
    ),
    category=FieldRule(".breadcrumb-item", many=True),
    images=FieldRule("img.page-image", attr="src", many=True),
    variants=FieldRule("script#offers"),  # attr=None → script text content
    strip_text=False,
    kind_rule="body-class",
)

#: host → rules for the production multi-site dispatcher
RULES_BY_HOST = {r.host: r for r in SITE_RULES.values()}


# ------------------------------------------------------------ rule parser

#: compiled selector lists per SiteRules instance (rule rows are
#: module-level singletons; keyed by id so the dict-bearing frozen
#: dataclass needn't be hashable) — parse cost per page stays O(bytes)
_COMPILED: dict = {}


def _compiled_rules(rules: SiteRules):
    key = id(rules)
    got = _COMPILED.get(key)
    if got is not None and got[0] is rules:
        return got[1], got[2]
    text_rules, attr_rules = [], []
    for name, fr in rules.text_fields.items():
        text_rules.append((name, compile_selector(fr.selector), fr.many))
    if rules.category is not None:
        text_rules.append(("_category", compile_selector(rules.category.selector), True))
    if rules.pagination_labels is not None:
        text_rules.append(("_page_label", compile_selector(rules.pagination_labels.selector), True))
    if rules.variants is not None:
        c = compile_selector(rules.variants.selector)
        if rules.variants.attr is None:
            text_rules.append(("_variants", c, False))
        else:
            attr_rules.append(("_variants", c, rules.variants.attr))
    for fr in (rules.section_links, rules.product_links):
        if fr is not None:
            attr_rules.append(("_link", compile_selector(fr.selector), fr.attr or "href"))
    if rules.images is not None:
        attr_rules.append(("_image", compile_selector(rules.images.selector), rules.images.attr or "src"))
    _COMPILED[key] = (rules, text_rules, attr_rules)
    return text_rules, attr_rules


class RuleParser(HTMLParser):
    """One streaming pass interpreting a :class:`SiteRules` row.

    Captured text is the FULL descendant text of the matched element
    (finalized when the element's own end tag closes — nested markup no
    longer truncates fields).  Attribute rules fire at the start tag.
    """

    def __init__(self, rules: SiteRules, page_url: str):
        super().__init__(convert_charrefs=True)
        self.rules = rules
        self.page_url = page_url
        self.kind: Optional[str] = None
        self.out_links: list[str] = []
        self.page_labels: list[str] = []
        self.images: list[dict] = []
        self.variants_json: Optional[str] = None
        self._texts: dict[str, list[str]] = {}   # field -> captured strings
        self._stack: list[_Frame] = []
        self._active: list[list] = []            # [sink, depth, buf]
        self._text_rules, self._attr_rules = _compiled_rules(rules)

    # -- tree bookkeeping

    def _on_element(self, tag, attrs):
        parent = self._stack[-1] if self._stack else None
        if parent is not None:
            parent.n_children += 1
        frame = _Frame(tag, dict(attrs), parent.n_children if parent else 1)
        self._stack.append(frame)
        path = self._stack
        if self.rules.kind_rule == "body-class" and tag == "body":
            for c in frame.classes:
                if c.startswith("kind-"):
                    self.kind = c[len("kind-"):]
        for sink, compiled, attr in self._attr_rules:
            if attr in frame.attrs and sel_matches(compiled, path):
                self._emit_attr(sink, frame.attrs[attr], frame.attrs)
        for sink, compiled, many in self._text_rules:
            if (many or sink not in self._texts) and sel_matches(compiled, path):
                self._active.append([sink, len(self._stack), []])
        return frame

    def _emit_attr(self, sink, value, attrs):
        if sink == "_link":
            if value:
                self.out_links.append(absolutize(self.page_url, value))
        elif sink == "_image":
            if value:
                src = absolutize(self.page_url, value)
                self.images.append({
                    "image_id": src.rsplit("/", 1)[-1],
                    "src": src,
                    "caption": attrs.get("alt"),
                })
        elif sink == "_variants" and self.variants_json is None:
            # html.parser has already entity-decoded the attribute value
            # (the reference decodes explicitly, rusteaco.rs:275-277);
            # downstream S6 unescape is a no-op on decoded JSON
            self.variants_json = value

    def handle_starttag(self, tag, attrs):
        frame = self._on_element(tag, attrs)
        if tag in _VOID:
            self._pop_frame(frame)

    def handle_startendtag(self, tag, attrs):
        frame = self._on_element(tag, attrs)
        self._pop_frame(frame)

    def _pop_frame(self, frame):
        depth = len(self._stack)
        assert self._stack[-1] is frame
        still = []
        for cap in self._active:
            if cap[1] == depth:
                self._finalize(cap)
            else:
                still.append(cap)
        self._active = still
        self._stack.pop()

    def handle_endtag(self, tag):
        if tag in _VOID:
            return  # already popped at starttag (self-closed or void)
        # pop until the matching open tag (tolerates implicitly-closed
        # elements like bare <li>); a stray end tag with no open match
        # is ignored
        if not any(f.tag == tag for f in self._stack):
            return
        while self._stack:
            top = self._stack[-1]
            self._pop_frame(top)
            if top.tag == tag:
                break

    def handle_data(self, data):
        for cap in self._active:
            cap[2].append(data)

    def _finalize(self, cap):
        sink, _, buf = cap
        text = "".join(buf)
        if self.rules.strip_text:
            text = text.strip()
        if sink == "_page_label":
            self.page_labels.append(text)
        elif sink == "_variants":
            if self.variants_json is None:
                self.variants_json = text
        else:
            self._texts.setdefault(sink, []).append(text)

    # -- output

    def result(self) -> Optional[dict]:
        r = self.rules
        fields = {
            f: (self._texts[f][0] if f in self._texts else None)
            for f in ("name", "sku", "price_str", "amount_str",
                      "units_raw", "description")
        }
        cats = self._texts.get("_category")
        category = (r.category.join.join(cats) if cats else None) if r.category else None
        if r.kind_rule == "body-class":
            kind = self.kind
        else:
            kind = _infer_kind(r, self.page_url, fields, self.variants_json,
                               self.out_links, self.page_labels)
        if kind is None:
            return None
        return {
            "kind": kind,
            "out_links": self.out_links,
            "page_labels": self.page_labels,
            "images": self.images,
            "variants_json": self.variants_json,
            "category": category,
            **fields,
        }


def _infer_kind(rules, page_url, fields, variants_json, out_links, page_labels):
    """Page kind for real stores (they carry no explicit marker): a page
    with product/pagination links is a listing ('category' on the
    unpaginated entry page, which is the page whose pagination the
    engine expands — F2) — EVEN when name+price selectors also matched,
    because live listing pages carry an h1 (the bare 'h1' name selector
    of wintergreen/101tea) and price-classed elements inside product
    cards, and classifying them 'product' would stop link expansion and
    stall the crawl after the seed (r05 ADVICE); a page with only menu
    links is the seed; a page with product fields and no listing markup
    is a product.  Anything else parses as a 404."""
    if out_links or page_labels:
        q = urlsplit(page_url).query
        paged = re.search(rf"(?:^|&){re.escape(rules.page_param)}=\d+", q)
        return "listing" if paged else ("category" if page_labels or not _is_root(page_url) else "seed")
    if fields["name"] is not None and (
        fields["price_str"] is not None or variants_json is not None
    ):
        return "product"
    return None


def _is_root(page_url: str) -> bool:
    s = urlsplit(page_url)
    return (s.path in ("", "/")) and not s.query


def parse_with_rules(rules: SiteRules, page_url: str, text: str) -> Optional[dict]:
    """Parse one page under a site's rule row; None = unrecognizable
    (lands ``ok=False`` exactly like a 404)."""
    p = RuleParser(rules, page_url)
    p.feed(text)
    p.close()
    return p.result()


def make_site_parse_fn(rules: SiteRules) -> Callable[[str, str], Optional[dict]]:
    """``parse_fn(page_url, text)`` for :func:`plans.http_fetch.make_http_fetch_fn`."""
    return lambda page_url, text: parse_with_rules(rules, page_url, text)


def make_multi_site_parse_fn(
    rules_by_host: Optional[dict] = None,
    default: Optional[SiteRules] = None,
) -> Callable[[str, str], Optional[dict]]:
    """Host-dispatched parse for a crawl spanning several stores —
    the production analog of the reference's one-crawler-per-site
    registry (src/crawlers/mod.rs)."""
    table = dict(RULES_BY_HOST if rules_by_host is None else rules_by_host)

    def parse(page_url: str, text: str) -> Optional[dict]:
        host = urlsplit(page_url).netloc
        rules = table.get(host, default)
        if rules is None:
            return None
        return parse_with_rules(rules, page_url, text)

    return parse
