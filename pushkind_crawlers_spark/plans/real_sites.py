"""Crawl the five REAL reference stores with the production engine.

``RealSiteWorld`` is the duck-typed world object :class:`CrawlEngine`
needs (site dimension, politeness rows, seeds) built from the
``SITE_RULES`` tables instead of a synthetic generator — the reference's
per-site constants (page param, last-page rule, concurrency:
SPEC.md:147-196, crawler.rs:43-47) become the engine's broadcast
dimension rows.  Combined with ``make_http_fetch_fn(real_http_transport,
make_multi_site_parse_fn())`` this is "point the engine at the actual
stores": same BFS rounds, budgets, dedup, snapshots — only the I/O seam
differs.  tests/test_real_sites.py drives it over fixture replicas of
all five stores' HTML offline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from .http_fetch import http_robots_txt_fn, make_http_fetch_fn, real_http_transport
from .site_rules import RULES_BY_HOST, SiteRules, make_multi_site_parse_fn


@dataclass(frozen=True)
class _HostCfg:
    host: str
    idx: int
    page_param: str
    last_page_rule: str
    budget_per_round: int
    amount_source: str


class RealSiteWorld:
    """Site dim + politeness + seeds for a real-store crawl.

    ``budget_scale`` multiplies each site's reference concurrency into a
    per-round politeness budget (the reference's concurrency limit is
    its politeness knob — crawler.rs:43-47; the engine's equivalent is
    the per-host round budget, operators/budget.py).
    """

    def __init__(self, rules_by_host: Optional[dict] = None,
                 budget_scale: int = 8):
        rules = dict(RULES_BY_HOST if rules_by_host is None else rules_by_host)
        self._host_cfgs = {
            r.host: _HostCfg(
                host=r.host, idx=i, page_param=r.page_param,
                last_page_rule=r.last_page_rule,
                budget_per_round=max(1, r.concurrency * budget_scale),
                amount_source=r.amount_source,
            )
            for i, (_, r) in enumerate(sorted(rules.items()))
        }
        self.cfg = self  # .cfg.hosts() duck-typing with SyntheticWorld

    def hosts(self) -> list[str]:
        return list(self._host_cfgs)

    def host_config(self, host: str) -> _HostCfg:
        return self._host_cfgs[host]

    def politeness_rows(self) -> list[dict]:
        return [
            {"host": hc.host, "budget_per_round": hc.budget_per_round,
             "robots_disallow": [], "crawl_delay_ms": 0}
            for hc in self._host_cfgs.values()
        ]

    def seed_urls(self) -> list[str]:
        return [f"http://{h}/" for h in self._host_cfgs]

    def robots_txt(self, host: str) -> Optional[str]:
        # never used: real-store engines pass a transport-backed robots_fn
        return None


def real_site_engine(spark, store_root: str,
                     transport_factory: Optional[Callable] = None,
                     rules_by_host: Optional[dict] = None,
                     budget_scale: int = 8,
                     default_rules: Optional[SiteRules] = None,
                     **engine_kwargs):
    """A :class:`CrawlEngine` wired for the five real stores.

    ``transport_factory`` defaults to live HTTP; tests inject a fixture
    transport and get the identical engine path.
    """
    from .crawl import CrawlEngine

    if transport_factory is None:
        # resolved at call time so tests can monkeypatch the module name
        transport_factory = real_http_transport
    world = RealSiteWorld(rules_by_host, budget_scale)
    fetch_fn = make_http_fetch_fn(
        transport_factory,
        make_multi_site_parse_fn(rules_by_host, default=default_rules),
    )
    robots_fn = http_robots_txt_fn(transport_factory)
    return CrawlEngine(spark, world, store_root,
                       fetch_fn=fetch_fn, robots_fn=robots_fn,
                       **engine_kwargs)
