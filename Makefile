# Common tasks. TPU runs use the ambient (tunneled) device; tests force a
# virtual 8-device CPU mesh via tests/conftest.py.

.PHONY: test test-fast native bench bench-matrix validate dryrun clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_ops_core.py tests/test_mlp.py \
	    tests/test_configs.py tests/test_native.py tests/test_metrics.py \
	    tests/test_geometry3d.py tests/test_vis.py -q

native:
	python -c "from endosurf_tpu.native.build import build_library; print(build_library())"

bench:
	python bench.py

bench-matrix:
	python tools/bench_matrix.py

validate:
	python tools/validate_synthetic.py --steps 4000 --precision high

dryrun:
	python __graft_entry__.py

clean:
	rm -f endosurf_tpu/native/_geometry.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
