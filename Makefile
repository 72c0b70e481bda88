# Test / verification lanes.  CI cadence:
#   make test         — every commit (CPU, 8-device virtual mesh via conftest)
#   make golden-full  — before any bench/parity claim and after any layout or
#                       attention/kernel refactor: runs the full-scale SD1.5
#                       eps golden (~20 min single CPU core) plus the orbax
#                       checkpoint and hierarchical-mesh suites. PARITY.md
#                       records the commit of the last run.
#   make bench        — on the axon TPU: the flagship BASELINE config #3 line.

PY ?= python

test:
	JAX_PLATFORMS=cpu $(PY) -m pytest tests/ -x -q

golden-full:
	HVT_FULL_GOLDEN=1 JAX_PLATFORMS=cpu $(PY) -m pytest \
	  tests/test_golden_torch.py tests/test_golden_pipeline.py \
	  tests/test_checkpoint_orbax.py tests/test_hierarchical_mesh.py -q

bench:
	$(PY) bench.py

.PHONY: test golden-full bench
