# Build / test / bench entry points (the CMake+CTest analog of the
# reference's top-level build, CMakeLists.txt:146-187).

CXX ?= g++
CXXFLAGS ?= -O3 -std=c++17 -shared -fPIC -pthread -fno-exceptions
NATIVE_LIB = rocjpeg_tpu/runtime/librocjpeg_host.so

.PHONY: all native test test-fast bench clean

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): csrc/rocjpeg_entropy.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x -k "not perf"

bench: native
	python bench.py

clean:
	rm -f $(NATIVE_LIB)
	rm -rf build dist *.egg-info
