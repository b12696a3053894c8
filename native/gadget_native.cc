// Native runtime support: Gadget format-1 block I/O and Morton keys.
//
// The reference's I/O layer is C (nbody/io.c, nbody/read_ic.c) with
// F77-style block markers; this library provides the same binary format at
// memcpy speed for the TPU build's host side (snapshot/IC loading is pure
// host work — the one part of the pipeline where native code beats Python).
// Exposed with a C ABI for ctypes; sidm_tpu/io/native.py wraps it and falls
// back to the pure-Python implementation when the library is absent.
//
// Build: make -C native   (produces libgadget_native.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Header {
  int32_t npart[6];
  double mass[6];
  double time;
  double redshift;
  int32_t flag_sfr;
  int32_t flag_feedback;
  int32_t npart_total[6];
  int32_t flag_cooling;
  int32_t num_files;
  double box_size;
  double omega0;
  double omega_lambda;
  double hubble_param;
  int32_t flag_multiphase;
  int32_t flag_stellarage;
  int32_t flag_sfrhistogram;
  char fill[84];
};
static_assert(sizeof(Header) == 256, "Gadget header must be 256 bytes");

bool read_block(FILE* f, void* dst, long expect_bytes) {
  int32_t n = 0;
  if (fread(&n, 4, 1, f) != 1) return false;
  if (expect_bytes >= 0 && n != expect_bytes) return false;
  if (dst != nullptr) {
    if (fread(dst, 1, n, f) != static_cast<size_t>(n)) return false;
  } else {
    if (fseek(f, n, SEEK_CUR) != 0) return false;
  }
  int32_t n2 = 0;
  if (fread(&n2, 4, 1, f) != 1 || n2 != n) return false;
  return true;
}

bool write_block(FILE* f, const void* src, int32_t bytes) {
  if (fwrite(&bytes, 4, 1, f) != 1) return false;
  if (fwrite(src, 1, bytes, f) != static_cast<size_t>(bytes)) return false;
  if (fwrite(&bytes, 4, 1, f) != 1) return false;
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success. Header copied into hdr (256 bytes).
int gadget_read_header(const char* path, void* hdr) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  int ok = read_block(f, hdr, 256) ? 0 : 2;
  fclose(f);
  return ok;
}

// Reads pos/vel/id/mass/u blocks. Caller allocates from header counts:
// pos,vel: 3n floats; id: n uint32; mass: n floats (filled from the header
// table for fixed-mass types); u: ngas floats (zeroed if absent).
// Returns 0 on success.
int gadget_read_body(const char* path, float* pos, float* vel, uint32_t* id,
                     float* mass, float* u) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  Header h;
  if (!read_block(f, &h, 256)) { fclose(f); return 2; }
  long n = 0;
  for (int t = 0; t < 6; t++) n += h.npart[t];
  long ngas = h.npart[0];

  if (!read_block(f, pos, 12 * n)) { fclose(f); return 3; }
  if (!read_block(f, vel, 12 * n)) { fclose(f); return 4; }
  if (!read_block(f, id, 4 * n)) { fclose(f); return 5; }

  long n_with_mass = 0;
  for (int t = 0; t < 6; t++)
    if (h.mass[t] == 0 && h.npart[t] > 0) n_with_mass += h.npart[t];
  std::vector<float> mblock(n_with_mass);
  if (n_with_mass > 0) {
    if (!read_block(f, mblock.data(), 4 * n_with_mass)) {
      fclose(f);
      return 6;
    }
  }
  long ofs = 0, mo = 0;
  for (int t = 0; t < 6; t++) {
    for (int k = 0; k < h.npart[t]; k++, ofs++) {
      mass[ofs] = (h.mass[t] == 0) ? mblock[mo++]
                                   : static_cast<float>(h.mass[t]);
    }
  }
  if (ngas > 0 && u != nullptr) {
    if (!read_block(f, u, 4 * ngas)) memset(u, 0, 4 * ngas);
  }
  fclose(f);
  return 0;
}

// Writes a single-file snapshot. mass_table[t] == 0 marks types whose masses
// are in the per-particle block. Returns 0 on success.
int gadget_write(const char* path, const void* hdr, const float* pos,
                 const float* vel, const uint32_t* id, const float* mass,
                 const float* u, const float* rho, const float* hsml) {
  const Header* h = reinterpret_cast<const Header*>(hdr);
  long n = 0;
  for (int t = 0; t < 6; t++) n += h->npart[t];
  long ngas = h->npart[0];

  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  bool ok = write_block(f, hdr, 256) && write_block(f, pos, 12 * n) &&
            write_block(f, vel, 12 * n) && write_block(f, id, 4 * n);
  if (ok) {
    std::vector<float> mblock;
    long ofs = 0;
    for (int t = 0; t < 6; t++) {
      for (int k = 0; k < h->npart[t]; k++, ofs++)
        if (h->mass[t] == 0) mblock.push_back(mass[ofs]);
    }
    if (!mblock.empty())
      ok = write_block(f, mblock.data(), 4 * mblock.size());
  }
  if (ok && ngas > 0 && u) ok = write_block(f, u, 4 * ngas);
  if (ok && ngas > 0 && rho) ok = write_block(f, rho, 4 * ngas);
  if (ok && ngas > 0 && hsml) ok = write_block(f, hsml, 4 * ngas);
  fclose(f);
  return ok ? 0 : 2;
}

// 30-bit Morton keys (10 bits/axis), matching sidm_tpu/ops/morton.py.
void morton_keys(const float* pos, long n, const float* origin, float extent,
                 uint32_t* keys) {
  const float grid = 1024.0f;
  for (long i = 0; i < n; i++) {
    uint32_t out = 0;
    uint32_t c[3];
    for (int a = 0; a < 3; a++) {
      float x = (pos[3 * i + a] - origin[a]) / extent * grid;
      if (x < 0) x = 0;
      if (x > grid - 1) x = grid - 1;
      uint32_t v = static_cast<uint32_t>(x) & 0x3FF;
      v = (v | (v << 16)) & 0x030000FF;
      v = (v | (v << 8)) & 0x0300F00F;
      v = (v | (v << 4)) & 0x030C30C3;
      v = (v | (v << 2)) & 0x09249249;
      c[a] = v;
    }
    out = (c[0] << 2) | (c[1] << 1) | c[2];
    keys[i] = out;
  }
}

}  // extern "C"
