"""Golden-parity tests for the C/C++ RNG replicas (utils/cpp_rng.py).

Golden values were produced by compiling a plain-stdlib C++ program with the
system g++ (no reference code): glibc srand/rand draws and std::mt19937
outputs.  If g++ is available the goldens are re-derived live to guard
against platform drift.
"""

import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from simd_radix_sort_tpu.utils import cpp_rng

GLIBC_GOLDEN = {
    0: [1804289383, 846930886, 1681692777, 1714636915,
        1957747793, 424238335, 719885386, 1649760492],
    1: [1804289383, 846930886, 1681692777, 1714636915,
        1957747793, 424238335, 719885386, 1649760492],
    123456789: [1965102536, 1639725855, 706684578, 1926601937,
                71238646, 1147998030, 1038816544, 940714160],
    4294967295: [254925627, 1205188300, 366127624, 1401405153,
                 76053476, 1604170158, 1302235366, 362229243],
}

MT_GOLDEN = {
    5489: [3499211612, 581869302, 3890346734, 3586334585,
           545404204, 4161255391],
    0: [2357136044, 2546248239, 3071714933, 3626093760,
        2588848963, 3684848379],
    987654321: [313482503, 1226283474, 927869703, 3285297254,
                1996101040, 1316974753],
}


def test_glibc_rand_golden():
    seeds = np.array(sorted(GLIBC_GOLDEN), dtype=np.uint32)
    got = cpp_rng.glibc_rand_stream(seeds, 8)
    for row, s in zip(got, sorted(GLIBC_GOLDEN)):
        assert row.tolist() == GLIBC_GOLDEN[s], s


def test_mt19937_golden():
    for seed, want in MT_GOLDEN.items():
        assert cpp_rng.Mt19937(seed).draw(6).tolist() == want


def test_mt19937_10000th():
    # The C++ standard pins mt19937's 10000th output (ISO/IEC 14882
    # [rand.predef]): 4123659995.
    g = cpp_rng.Mt19937(5489)
    g.draw(9999)
    assert g.next() == 4123659995


def test_mt19937_block_boundaries():
    # Draw in awkward chunk sizes across the 624-word twist boundary and
    # compare against one continuous draw.
    a = cpp_rng.Mt19937(42).draw(2000)
    g = cpp_rng.Mt19937(42)
    parts = [g.draw(k) for k in (1, 622, 3, 700, 674)]
    assert np.array_equal(a, np.concatenate(parts))


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_live_cpp_parity():
    src = r"""
    #include <cstdio>
    #include <cstdlib>
    #include <random>
    int main() {
      srand(777u);
      for (int i = 0; i < 40; i++) printf("%d\n", rand());
      std::mt19937 g(314159u);
      for (int i = 0; i < 40; i++) printf("%u\n", g());
      return 0;
    }
    """
    with tempfile.TemporaryDirectory() as td:
        cpp = f"{td}/a.cpp"
        exe = f"{td}/a"
        open(cpp, "w").write(src)
        subprocess.run(["g++", "-O1", "-o", exe, cpp], check=True)
        out = subprocess.run([exe], capture_output=True, text=True,
                             check=True).stdout.split()
    vals = [int(v) for v in out]
    got_rand = cpp_rng.glibc_rand_stream(np.array([777], np.uint32), 40)[0]
    assert got_rand.tolist() == vals[:40]
    got_mt = cpp_rng.Mt19937(314159).draw(40)
    assert [int(v) for v in got_mt] == vals[40:]
