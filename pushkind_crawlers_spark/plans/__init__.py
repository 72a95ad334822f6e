"""Driver-side plans: the BFS round scheduler (crawl), and the analytics
jobs (benchmark association, category assignment)."""
