# Test tiers (see tests/conftest.py markers)
#
#   make test-fast   default tier: every component covered, no full-size gates,
#                    one smoke per CLI surface; parallelized over CPUs via
#                    pytest-xdist (-n auto). Budget: <10 min on an 8-CPU
#                    runner (~20-25 min single-core serial).
#   make test-full   everything: + full-size parity gates (slow) and the
#                    fresh-process CLI/preemption/multihost tests
#                    (slow_subprocess, minutes apiece)
#
# The driver-run dryrun (__graft_entry__.dryrun_multichip) independently
# exercises dp/tp/fsdp/pp/pp*dp*tp/sp/chain at ViT-L widths every round, so
# the heavy parallel gradient tests live in the full tier.

PYTEST ?= python -m pytest
JOBS ?= auto

.PHONY: test-fast test-fast-serial test-full

test-fast:
	$(PYTEST) tests/ -q -n $(JOBS)

test-fast-serial:
	$(PYTEST) tests/ -x -q

test-full:
	$(PYTEST) tests/ -q --run-slow
