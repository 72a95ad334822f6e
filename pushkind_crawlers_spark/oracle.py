"""Pure-Python reference crawler — the parity ground truth.

A single-threaded, insertion-ordered implementation of the reference's
BFS dataflow F1-F11 (SURVEY.md §2.1) over the synthetic world, defining
the *deterministic refinement* of the reference semantics (SURVEY.md §2.7):

* discovery order = (depth, ord) where ``ord`` is the fixed-width hex
  document-order path from the seed (category doc-order, then page number,
  then link doc-order — matching ``join_all`` order preservation at
  src/crawlers/wintergreen.rs:160-182);
* URL dedup is first-discovery-wins in that order (the reference's
  ``HashSet`` dedup at wintergreen.rs:175-176/184-188 with the unordered
  set replaced by an insertion-ordered one);
* per-host politeness budget = at most ``budget_per_round`` fetches per
  host per round, taken as the (depth, ord)-first prefix (the semaphore at
  wintergreen.rs:36,45 over an already-fixed task order);
* robots disallow prefixes reject at discovery time (north-rule extension;
  the reference has no robots handling).

The Spark engine (plans.crawl) must reproduce: the scheduled-fetch order,
the final URL-seen membership, every validated result row, and per-image
decoded pixels + caption bytes.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from .functions.parsing import (
    amount_filter_py,
    clean_price_py,
    parse_amount_units_py,
    trim_to_none_py,
    unescape_entities_py,
)
from .functions.urlnorm import canonicalize_url
from .synth.worldgen import SyntheticWorld


def hseg(i: int) -> str:
    """One 4-hex-digit ord segment (document-order index, < 65536)."""
    return format(i, "04x")


@dataclass
class OracleResult:
    order: list[dict] = field(default_factory=list)    # seq, round, url, depth, ord, host
    seen: dict[str, int] = field(default_factory=dict)  # canonical url -> round
    results: list[dict] = field(default_factory=list)
    rejects: list[dict] = field(default_factory=list)
    images: list[dict] = field(default_factory=list)    # image_id, caption, url
    lineage: list[dict] = field(default_factory=list)
    rounds: int = 0


class OracleCrawler:
    def __init__(
        self,
        world: SyntheticWorld,
        seeds: list[str] | None = None,
        max_rounds: int | None = None,
        use_robots: bool = True,
    ):
        self.world = world
        self.seeds = seeds if seeds is not None else world.seed_urls()
        self.max_rounds = max_rounds
        self.use_robots = use_robots

    def _budget(self, host: str) -> int:
        """Politeness budget; unknown hosts get the engine's default
        (operators/budget.py DEFAULT_BUDGET coalesce)."""
        try:
            return self.world.host_config(host).budget_per_round
        except KeyError:
            return 5

    def _robots_blocked(self, host: str, url: str) -> bool:
        if not self.use_robots:
            return False
        try:
            rules = self.world.host_config(host).robots_disallow
        except KeyError:
            return False
        path = url.split(host, 1)[1] if host in url else url
        return any(path.startswith(p) for p in rules)

    def run(self) -> OracleResult:
        res = OracleResult()
        frontier: list[dict] = []
        for i, u in enumerate(self.seeds):
            cu = canonicalize_url(u)
            if cu in res.seen:
                continue
            host = cu.split("://", 1)[1].split("/", 1)[0]
            res.seen[cu] = 0
            frontier.append({"url": cu, "host": host, "depth": 0, "ord": hseg(i)})
        seq = 0
        rnd = 0
        while frontier and (self.max_rounds is None or rnd < self.max_rounds):
            rnd += 1
            # --- budget truncation: per host, (depth, ord)-first prefix ---
            by_host: dict[str, list[dict]] = {}
            for row in frontier:
                by_host.setdefault(row["host"], []).append(row)
            scheduled: list[dict] = []
            for host, rows in by_host.items():
                rows.sort(key=lambda r: (r["depth"], r["ord"]))
                scheduled.extend(rows[: self._budget(host)])
            sched_keys = {r["url"] for r in scheduled}
            frontier = [r for r in frontier if r["url"] not in sched_keys]
            scheduled.sort(key=lambda r: (r["depth"], r["ord"]))
            lineage: dict[str, dict] = {}

            # --- fetch + discover, in scheduled order ---
            candidates: list[dict] = []  # discovery-ordered new-link candidates
            for row in scheduled:
                seq += 1
                res.order.append(
                    {
                        "seq": seq,
                        "round": rnd,
                        "url": row["url"],
                        "host": row["host"],
                        "depth": row["depth"],
                        "ord": row["ord"],
                    }
                )
                ln = lineage.setdefault(
                    row["host"],
                    {
                        "round": rnd, "host": row["host"], "scheduled": 0,
                        "fetched": 0, "fetch_errors": 0, "links_discovered": 0,
                        "links_new": 0, "links_dup": 0, "robots_rejected": 0,
                        "results_rows": 0, "reject_rows": 0,
                    },
                )
                ln["scheduled"] += 1
                doc = self.world.fetch(row["url"])
                if doc is None:
                    ln["fetch_errors"] += 1
                    continue
                ln["fetched"] += 1
                if doc.kind != "product":
                    # non-product imagery (category banners) lands in the
                    # images table too; product images append in
                    # _emit_product (valid rows only — invalid products
                    # carry no images in the world by construction)
                    for im in doc.images:
                        res.images.append(
                            {"image_id": im["image_id"], "caption": im["caption"],
                             "url": row["url"]}
                        )
                if doc.kind == "seed":
                    for j, link in enumerate(doc.out_links):
                        candidates.append(
                            {"url": link, "depth": 1, "ord": row["ord"] + hseg(j), "host": row["host"]}
                        )
                elif doc.kind == "category":
                    # pagination expansion (F2): pages 2..=last get slot p-1;
                    # page-1 product links live under slot 0. The last page
                    # is READ from the pagination labels under the per-site
                    # rule (second-to-last for teanadin-style arrow blocks,
                    # teanadin.rs:95-99), never taken from ground truth.
                    host = row["host"]
                    rule = self.world.host_config(host).last_page_rule
                    labels = doc.page_labels
                    if rule == "second_last":
                        lab = labels[-2] if len(labels) >= 2 else None
                    else:
                        lab = labels[-1] if labels else None
                    try:
                        last_eff = int(lab)
                    except (TypeError, ValueError):
                        last_eff = 1
                    c = int(row["url"].split("/cat/")[1].split("?")[0])
                    for p in range(2, last_eff + 1):
                        candidates.append(
                            {
                                "url": self.world.listing_url(host, c, p),
                                "depth": 2,
                                "ord": row["ord"] + hseg(p - 1),
                                "host": host,
                            }
                        )
                    for j, link in enumerate(doc.out_links):
                        candidates.append(
                            {"url": link, "depth": 3, "ord": row["ord"] + hseg(0) + hseg(j), "host": host}
                        )
                elif doc.kind == "listing":
                    for j, link in enumerate(doc.out_links):
                        candidates.append(
                            {"url": link, "depth": 3, "ord": row["ord"] + hseg(j), "host": row["host"]}
                        )
                elif doc.kind == "product":
                    self._emit_product(res, row, doc, rnd, ln)

            # --- discovery dedup: first-wins in ord order, minus seen ------
            candidates.sort(key=lambda c: c["ord"])
            for c in candidates:
                cu = canonicalize_url(c["url"])
                ln = lineage[c["host"]]
                ln["links_discovered"] += 1
                if cu in res.seen:
                    ln["links_dup"] += 1
                    continue
                res.seen[cu] = rnd
                if self._robots_blocked(c["host"], cu):
                    ln["robots_rejected"] += 1
                    res.rejects.append(
                        {"url": cu, "host": c["host"], "reject_reason": "robots", "round": rnd}
                    )
                    continue
                ln["links_new"] += 1
                frontier.append({"url": cu, "host": c["host"], "depth": c["depth"], "ord": c["ord"]})
            for ln in lineage.values():
                res.lineage.append(ln)
        res.rounds = rnd
        return res

    def _emit_product(self, res: OracleResult, row: dict, doc, rnd: int, ln: dict) -> None:
        p = doc.payload
        sku = trim_to_none_py(p["sku"])
        name = trim_to_none_py(p["name"])
        price = clean_price_py(p["price_str"])
        if sku is None:
            reason = "invalid_sku"
        elif name is None:
            reason = "invalid_name"
        elif price is None or price < 0:
            reason = "invalid_price"
        else:
            reason = None
        if reason is not None:
            ln["reject_rows"] += 1
            res.rejects.append(
                {"url": row["url"], "host": row["host"], "reject_reason": reason, "round": rnd}
            )
            return
        crawler_id = self.world.host_config(row["host"]).idx
        caption = doc.images[0]["caption"] if doc.images else None
        image_ids = [im["image_id"] for im in doc.images]
        base = {
            "crawler_id": crawler_id,
            "host": row["host"],
            "category": trim_to_none_py(p["category"]),
            "description": trim_to_none_py(p["description"]),
            "image_ids": image_ids,
            "caption": caption,
            "ord": row["ord"],
            "round": rnd,
        }
        if doc.variants_json:
            # variant explosion (rusteaco.rs:29-53): one row per variant,
            # url suffixed '#{sku}', amount/units parsed from the title;
            # entity-decode first (S6, rusteaco.rs:275)
            for v in json.loads(unescape_entities_py(doc.variants_json)):
                amount, units = parse_amount_units_py(v.get("title"))
                res.results.append(
                    {
                        **base,
                        "sku": v["sku"],
                        "name": name,
                        "price": float(v["price"]),
                        "amount": amount_filter_py(amount),
                        "units": trim_to_none_py(units),
                        "url": f"{row['url']}#{v['sku']}",
                    }
                )
                ln["results_rows"] += 1
        else:
            amount, units = parse_amount_units_py(p["amount_str"])
            res.results.append(
                {
                    **base,
                    "sku": sku,
                    "name": name,
                    "price": price,
                    "amount": amount_filter_py(amount),
                    "units": trim_to_none_py(units),
                    "url": row["url"],
                }
            )
            ln["results_rows"] += 1
        for im in doc.images:
            res.images.append(
                {"image_id": im["image_id"], "caption": im["caption"], "url": row["url"]}
            )
