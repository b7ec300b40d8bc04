// Differential-parity harness: runs the UNMODIFIED reference coders
// (headers included read-only from /root/reference) as an encode/decode
// oracle for tools/fuzz_parity.py.  Like tools/ref_harness.cpp this is
// a measurement/verification harness, not framework code.
//
// Build:  g++ -O2 -std=c++17 -I/root/reference/include \
//             tools/ref_dump.cpp -o /tmp/ref_dump
// Usage:  ref_dump encode <method> <in.u32>  <out.blob>
//         ref_dump decode <method> <in.blob> <n> <out.u32>
// Methods: int msb fold1..fold8 rfold1..rfold4 sint<H> smsb<H> byte
// (byte encodes the low byte of every u32; decode writes u32s back).
// Exit 0 on success; nonzero + stderr message otherwise.  The caller
// must run this under a timeout: several reference coders loop forever
// on degenerate inputs (single-symbol alphabets).
#include <algorithm>
#include <array>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "ans_byte.hpp"
#include "ans_fold.hpp"
#include "ans_int.hpp"
#include "ans_msb.hpp"
#include "ans_reorder_fold.hpp"
#include "ans_sint.hpp"
#include "ans_smsb.hpp"
#include "shuff.hpp"

static std::vector<uint8_t> read_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(3); }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  if (sz && fread(buf.data(), 1, sz, f) != (size_t)sz) {
    fprintf(stderr, "short read %s\n", path); exit(3);
  }
  fclose(f);
  return buf;
}

static void write_file(const char* path, const uint8_t* p, size_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) { fprintf(stderr, "cannot open %s for write\n", path); exit(3); }
  if (n && fwrite(p, 1, n, f) != n) { fprintf(stderr, "short write\n"); exit(3); }
  fclose(f);
}

using enc_fn = size_t (*)(uint8_t*, size_t, const uint32_t*, size_t);
using dec_fn = void (*)(uint32_t*, size_t, const uint8_t*, size_t);

template <uint32_t f>
static size_t enc_fold(uint8_t* d, size_t c, const uint32_t* s, size_t m) {
  return ans_fold_compress<f>(d, c, s, m);
}
template <uint32_t f>
static void dec_fold(uint32_t* d, size_t m, const uint8_t* s, size_t c) {
  ans_fold_decompress<f>(d, m, s, c);
}
template <uint32_t f>
static size_t enc_rfold(uint8_t* d, size_t c, const uint32_t* s, size_t m) {
  return ans_reorder_fold_compress<f>(d, c, s, m);
}
template <uint32_t f>
static void dec_rfold(uint32_t* d, size_t m, const uint8_t* s, size_t c) {
  ans_reorder_fold_decompress<f>(d, m, s, c);
}
template <uint32_t H>
static size_t enc_sint(uint8_t* d, size_t c, const uint32_t* s, size_t m) {
  return ans_sint_compress<H>(d, c, s, m);
}
template <uint32_t H>
static size_t enc_smsb(uint8_t* d, size_t c, const uint32_t* s, size_t m) {
  return ans_smsb_compress<H>(d, c, s, m);
}

static bool pick(const std::string& m, enc_fn& enc, dec_fn& dec) {
  if (m == "int")   { enc = ans_int_compress;  dec = ans_int_decompress;  return true; }
  if (m == "shuff") { enc = shuff_compress;    dec = shuff_decompress;    return true; }
  if (m == "msb")   { enc = ans_msb_compress;  dec = ans_msb_decompress;  return true; }
  if (m == "fold1") { enc = enc_fold<1>; dec = dec_fold<1>; return true; }
  if (m == "fold2") { enc = enc_fold<2>; dec = dec_fold<2>; return true; }
  if (m == "fold3") { enc = enc_fold<3>; dec = dec_fold<3>; return true; }
  if (m == "fold4") { enc = enc_fold<4>; dec = dec_fold<4>; return true; }
  if (m == "fold5") { enc = enc_fold<5>; dec = dec_fold<5>; return true; }
  if (m == "fold6") { enc = enc_fold<6>; dec = dec_fold<6>; return true; }
  if (m == "fold7") { enc = enc_fold<7>; dec = dec_fold<7>; return true; }
  if (m == "fold8") { enc = enc_fold<8>; dec = dec_fold<8>; return true; }
  if (m == "rfold1") { enc = enc_rfold<1>; dec = dec_rfold<1>; return true; }
  if (m == "rfold2") { enc = enc_rfold<2>; dec = dec_rfold<2>; return true; }
  if (m == "rfold3") { enc = enc_rfold<3>; dec = dec_rfold<3>; return true; }
  if (m == "rfold4") { enc = enc_rfold<4>; dec = dec_rfold<4>; return true; }
  // decode reads H from the prelude, so one decompress serves every H
  if (m == "sint1")   { enc = enc_sint<1>;   dec = ans_sint_decompress; return true; }
  if (m == "sint80")  { enc = enc_sint<80>;  dec = ans_sint_decompress; return true; }
  if (m == "sint320") { enc = enc_sint<320>; dec = ans_sint_decompress; return true; }
  if (m == "smsb1")   { enc = enc_smsb<1>;   dec = ans_smsb_decompress; return true; }
  if (m == "smsb80")  { enc = enc_smsb<80>;  dec = ans_smsb_decompress; return true; }
  if (m == "smsb320") { enc = enc_smsb<320>; dec = ans_smsb_decompress; return true; }
  return false;
}

int main(int argc, char** argv) {
  if (argc < 5) { fprintf(stderr, "usage: see header\n"); return 2; }
  std::string mode = argv[1], method = argv[2];

  if (mode == "encode") {
    auto raw = read_file(argv[3]);
    size_t n = raw.size() / 4;
    const uint32_t* in = reinterpret_cast<const uint32_t*>(raw.data());
    std::vector<uint8_t> out(raw.size() + (16u << 20));
    size_t bytes;
    if (method == "byte") {
      std::vector<uint8_t> b(n);
      for (size_t i = 0; i < n; i++) b[i] = (uint8_t)(in[i] & 0xFF);
      bytes = ans_byte_compress(out.data(), out.size(), b.data(), n);
    } else {
      enc_fn enc; dec_fn dec;
      if (!pick(method, enc, dec)) { fprintf(stderr, "bad method %s\n", method.c_str()); return 2; }
      bytes = enc(out.data(), out.size(), in, n);
      // shuff_compress returns only the complete-u64 byte count; the
      // final partial word (up to 63 real bits) lives just past it
      // (SHUFF_FINISH_OUTPUT) — dump it too or the wire is truncated
      if (method == "shuff") bytes += 8;
    }
    write_file(argv[4], out.data(), bytes);
    return 0;
  }

  if (mode == "decode") {
    if (argc < 6) { fprintf(stderr, "usage: see header\n"); return 2; }
    auto blob = read_file(argv[3]);
    size_t n = strtoull(argv[4], nullptr, 10);
    size_t csize = blob.size();
    // shuff's decoder prefetches whole u64 words past the last
    // consumed bit; give it slack without changing csize (the ANS
    // decoders read backward from blob.data() + csize)
    blob.resize(blob.size() + 16, 0);
    std::vector<uint32_t> out(n);
    if (method == "byte") {
      std::vector<uint8_t> b(n);
      ans_byte_decompress(b.data(), n, blob.data(), csize);
      for (size_t i = 0; i < n; i++) out[i] = b[i];
    } else {
      enc_fn enc; dec_fn dec;
      if (!pick(method, enc, dec)) { fprintf(stderr, "bad method %s\n", method.c_str()); return 2; }
      dec(out.data(), n, blob.data(), csize);
    }
    write_file(argv[5], reinterpret_cast<uint8_t*>(out.data()), 4 * n);
    return 0;
  }
  fprintf(stderr, "bad mode %s\n", mode.c_str());
  return 2;
}
