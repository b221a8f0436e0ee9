"""raycrawl — a Ray-Data-native URL-frontier + fetch-scheduler engine.

From-scratch reimplementation of the observable semantics of
lodexinc/ospo-ghcrawler (reference at /root/reference) on top of
``ray.data.Dataset`` pipelines:

- request queues with priority classes + weighted scheduling
  (reference: lib/crawlerFactory.js:80,573-591)
- two-level URL-seen dedup (attenuation + tracker;
  reference: providers/queuing/attenuatedQueue.js,
  providers/queuing/redisRequestTracker.js) as sharded frontier actors
  holding insert-if-absent filters over SHA-1(url) hashes
- per-host politeness / rate limiting
  (reference: providers/limiting/*, providers/fetcher/tokenFactory.js)
- visitor-map traversal emitting documents + child requests
  (reference: test/unit/processingTests.js golden)
- deadletter handling, delta/lineage logging, resumability
  (reference: providers/storage/deltaStore.js, routes/deadletters.js)

Nothing in this package calls ``ray.init()`` — the caller owns the Ray
session (driver, tests' conftest fixture, or bench.py).
"""

__version__ = "0.1.0"
