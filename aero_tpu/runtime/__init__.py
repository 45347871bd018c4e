"""Process runtimes: decoder/publisher CLI entry points, signal hunter,
streaming orchestration."""
