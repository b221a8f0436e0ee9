"""Stateful frontier components: seen filters, shard actors, politeness."""
