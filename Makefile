# Convenience targets. `make parity` builds the ACTUAL reference
# libpyg.so (CPU-only; tools/build_reference.py patches the third-party
# submodule gaps) and runs the parity + model-activation suites against
# it — the same entry point CI uses (.github/workflows/test.yml).

REF_SRC ?= $(firstword $(wildcard /root/reference) /tmp/pyg-lib-src)
REF_URL ?= https://github.com/pyg-team/pyg-lib

.PHONY: test quick slow parity native

quick:
	python -m pytest tests/ -q -m 'not slow'

slow:
	python -m pytest tests/ -q -m slow

test: quick slow

native:
	$(MAKE) -C pyg_lib_tpu/csrc

parity:
	@test -d $(REF_SRC) || git clone --depth 1 --branch 0.9.0 \
		$(REF_URL) $(REF_SRC)
	@test -f /tmp/refsrc/build/libpyg.so || \
		python tools/build_reference.py --src $(REF_SRC)
	python -m pytest tests/test_reference_parity.py \
		tests/test_model_parity.py -q
