# Build / test / bench entry points (reference Makefile manages a conda env
# only; this one manages the native loader, tests, and benchmarks).

.PHONY: all native test test-fast bench bench-all perf-gate profile validate dryrun clean

all: native

native: cross_scale_mae_tpu/data/native/libcsmae_loader.so

cross_scale_mae_tpu/data/native/libcsmae_loader.so: cross_scale_mae_tpu/data/native/loader.cpp
	g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread -ffp-contract=off $< -o $@ -ljpeg -lpng -ltiff

test: native
	python -m pytest tests/ -x -q

test-fast: native
	python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

bench-all:  # all five BASELINE.json configs (slow: several TPU compiles)
	python benchmarks/all_configs.py

perf-gate:  # fail if the flagship bench regresses below recorded floors
	python benchmarks/check_regression.py

profile:    # per-HLO-category profile of the flagship step
	python benchmarks/profile_step.py

validate:   # end-to-end learning proof on a learnable JPEG dataset
	python benchmarks/validate_e2e.py

dryrun:
	python __graft_entry__.py

clean:
	rm -f cross_scale_mae_tpu/data/native/libcsmae_loader.so
	find . -name __pycache__ -type d -exec rm -rf {} +
