# Developer entry points (the reference's CMake/CTest+scripts equivalents).

.PHONY: test bench smoke native goldens microbench clean

test:
	python -m pytest tests/ -q

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
