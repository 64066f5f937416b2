# Build / test / bench entry points.

NATIVE_SRCS := native/editdist.cpp native/fastbpe.cpp
NATIVE_LIBS := native/build/libeditdist.so native/build/libfastbpe.so

.PHONY: all native test test-fast bench clean

all: native

native: $(NATIVE_LIBS)

native/build/lib%.so: native/%.cpp
	@mkdir -p native/build
	g++ -O3 -shared -fPIC -o $@ $<

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -m "not slow"

bench: native
	python bench.py

clean:
	rm -rf native/build
