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
