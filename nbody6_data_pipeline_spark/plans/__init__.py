"""Pipeline orchestration: checkpoint/resume manifests."""
