# Developer entry points (the reference's CMake/CTest+scripts equivalents).

.PHONY: test bench smoke native goldens microbench clean

test:
	python -m pytest tests/ -q

# Compiled-kernel smoke on real TPU hardware (tests/ runs interpret-mode
# kernels on a virtual CPU mesh; this compiles the Mosaic kernels).
test-tpu:
	python -m pytest tests_tpu/ -q

bench:
	python bench.py

# Cold-lowering guard: compile the whole kernel battery from source with
# the persistent compilation cache DISABLED (catches toolchain breaks the
# committed .jax_cache would mask — see tools/cold_lower.py). Needs TPU.
cold-lower:
	python tools/cold_lower.py

smoke:
	./scripts/smoke-test.sh

native:
	$(MAKE) -C csrc

goldens:
	python tests/test_golden_images.py --regen

microbench:
	python benchmarks/run_benchmarks.py

clean:
	$(MAKE) -C csrc clean
	find . -name __pycache__ -type d -exec rm -rf {} +
