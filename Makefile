# construction-clip-tpu — common tasks

.PHONY: test bench bench-decode bench-train native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" --ignore=tests/test_cli_apps.py

bench:        ## headline encode throughput (real TPU, one JSON line)
	python bench.py

bench-decode: ## caption decode tokens/sec (real TPU)
	python tools/bench_decode.py

bench-train:  ## contrastive step time (real TPU)
	python tools/bench_train.py

native:       ## build the C++ image-ingest library
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
