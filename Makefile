# Workflow entry points (the reference uses a justfile; same verbs here).

PYTHON ?= python
DATA_ROOT ?= data/shapes
CASE ?=

.PHONY: test bench native shapes of-solve postprocess stats train clean

# fast set (slow-marked compile/e2e/subprocess tests excluded): ~8 min on 1 CPU
test:
	$(PYTHON) -m pytest tests/ -x -q -m "not slow"

# everything, including the multi-minute compile/e2e tests (~50 min on 1 CPU)
test-all:
	$(PYTHON) -m pytest tests/ -q

# parallel run (pytest-xdist, if more CPUs are available)
test-fast:
	$(PYTHON) -m pytest tests/ -q -n 4

bench:
	$(PYTHON) bench.py

# Build the native components (C++ EMD solver).
native:
	$(MAKE) -C native

# Generate the 45-shape dataset cases (add MOCK=1 for the offline pipeline).
shapes:
	$(PYTHON) scripts/generate-shapes.py $(DATA_ROOT) $(if $(MOCK),--mock-solve)

# Solve one case with dockerized OpenFOAM (CASE=path).
of-solve:
	docker run --rm -v "$(abspath $(CASE)):/case" openfoam/openfoam10-paraview510 /case/entrypoint.sh

# Post-process one solved case: convert + embed + aux analyses (CASE=path).
postprocess:
	$(PYTHON) scripts/foam2h5.py $(CASE) --grid-embedding
	$(PYTHON) scripts/case-analysis.py $(CASE)/data.h5 --all

stats:
	$(PYTHON) scripts/dataset-stats.py $(DATA_ROOT)

train:
	$(PYTHON) scripts/train.py model=diffusion data.root=$(DATA_ROOT)

clean:
	rm -rf runs/ __pycache__ .pytest_cache
