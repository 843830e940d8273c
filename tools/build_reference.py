"""Build the reference pyg-lib (`libpyg.so`, CPU-only) for parity testing.

The reference sits read-only at /root/reference with empty (un-fetched)
third_party submodules and no network access, so a vanilla build cannot
work. This script makes it buildable without touching the original tree:

1. copies the source to a scratch dir (CMake writes config.h into the
   source tree, reference CMakeLists.txt:60),
2. disables METIS (empty submodule; `metis` raises at call time via the
   NO_METIS path, reference csrc/partition/cpu/metis_kernel.cpp:22-28),
3. provides a minimal `parallel_hashmap/phmap.h` stand-in mapping the
   phmap API surface pyg-lib uses onto std::unordered_map/set (via the
   EXTERNAL_PHMAP_INCLUDE_DIR hook, reference CMakeLists.txt:107-112),
4. configures CPU-only against the installed torch and builds with ninja.

Usage: python tools/build_reference.py [--src /root/reference]
Prints the path of the built libpyg.so. Takes ~15 min on one core.
The parity suite (tests/test_reference_parity.py) looks for the library
at $PYGT_REFERENCE_LIB, then /tmp/refsrc/build/libpyg.so.
"""

import argparse
import os
import shutil
import subprocess
import sys

PHMAP_SHIM = '''\
// Minimal stand-in for greg7mdp/parallel-hashmap (empty submodule in this
// offline image): maps the phmap API surface used by pyg-lib onto
// std::unordered_map/set. Only used to build the REFERENCE library for
// parity testing; not part of pyg_lib_tpu.
#pragma once
#include <cstddef>
#include <functional>
#include <string>
#include <tuple>
#include <unordered_map>
#include <unordered_set>
#include <utility>

namespace phmap {
namespace priv {
inline std::size_t hash_combine(std::size_t seed, std::size_t v) {
  return seed ^ (v + 0x9e3779b97f4a7c15ULL + (seed << 6) + (seed >> 2));
}
template <typename T> struct shim_hash : std::hash<T> {};
template <typename A, typename B> struct shim_hash<std::pair<A, B>> {
  std::size_t operator()(const std::pair<A, B>& p) const {
    return hash_combine(shim_hash<A>{}(p.first), shim_hash<B>{}(p.second));
  }
};
template <typename... Ts> struct shim_hash<std::tuple<Ts...>> {
  std::size_t operator()(const std::tuple<Ts...>& t) const {
    std::size_t seed = 0;
    std::apply(
        [&seed](const Ts&... parts) {
          ((seed = hash_combine(seed, shim_hash<Ts>{}(parts))), ...);
        },
        t);
    return seed;
  }
};
template <typename K> using hash_default_hash = shim_hash<K>;
template <typename K> using hash_default_eq = std::equal_to<K>;
template <typename P> using Allocator = std::allocator<P>;
}  // namespace priv

template <typename K, typename V,
          typename H = priv::hash_default_hash<K>,
          typename E = priv::hash_default_eq<K>,
          typename A = priv::Allocator<std::pair<const K, V>>>
using flat_hash_map = std::unordered_map<K, V, H, E, A>;

template <typename K,
          typename H = priv::hash_default_hash<K>,
          typename E = priv::hash_default_eq<K>,
          typename A = std::allocator<K>>
using flat_hash_set = std::unordered_set<K, H, E, A>;

// The real type shards into 2^N submaps for concurrent build; the parity
// harness pins torch.set_num_threads(1), where a plain map is equivalent.
template <typename K, typename V,
          typename H = priv::hash_default_hash<K>,
          typename E = priv::hash_default_eq<K>,
          typename A = priv::Allocator<std::pair<const K, V>>,
          std::size_t N = 4, typename Mutex = void>
using parallel_flat_hash_map = std::unordered_map<K, V, H, E, A>;
}  // namespace phmap
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--src', default='/root/reference')
    ap.add_argument('--work', default='/tmp/refsrc')
    args = ap.parse_args()

    if not os.path.exists(args.work):
        shutil.copytree(args.src, args.work)
        cml = os.path.join(args.work, 'CMakeLists.txt')
        text = open(cml).read()
        text = text.replace('set(NO_METIS 0)', 'set(NO_METIS 1)')
        text = text.replace('if (NOT MSVC)',
                            'if (FALSE) # METIS submodule absent offline', 1)
        open(cml, 'w').write(text)

    shim_dir = os.path.join(args.work, 'phmap_shim')
    os.makedirs(os.path.join(shim_dir, 'parallel_hashmap'), exist_ok=True)
    with open(os.path.join(shim_dir, 'parallel_hashmap', 'phmap.h'),
              'w') as f:
        f.write(PHMAP_SHIM)

    import torch

    build = os.path.join(args.work, 'build')
    os.makedirs(build, exist_ok=True)
    env = dict(os.environ, EXTERNAL_PHMAP_INCLUDE_DIR=shim_dir)
    subprocess.run([
        'cmake', '..', '-GNinja', '-DCMAKE_BUILD_TYPE=Release',
        '-DWITH_CUDA=OFF', '-DBUILD_TEST=OFF',
        f'-DCMAKE_PREFIX_PATH={torch.utils.cmake_prefix_path}'
    ], cwd=build, env=env, check=True)
    subprocess.run(['ninja'], cwd=build, env=env, check=True)

    so = os.path.join(build, 'libpyg.so')
    assert os.path.exists(so)
    print(so)
    return 0


if __name__ == '__main__':
    sys.exit(main())
