"""End-to-end pipelines: the epoch crawl loop and extraction pipelines."""
