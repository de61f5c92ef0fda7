# Test tiers (see tests/conftest.py markers)
#
#   make test-fast   default tier: every component covered, no full-size gates,
#                    one smoke per CLI surface; budget < 10 min on 8 CPUs
#   make test-full   everything: + full-size parity gates (slow) and the
#                    fresh-process CLI/preemption/multihost tests
#                    (slow_subprocess, minutes apiece)

PYTEST ?= python -m pytest

.PHONY: test-fast test-full

test-fast:
	$(PYTEST) tests/ -x -q

test-full:
	$(PYTEST) tests/ -q --run-slow
