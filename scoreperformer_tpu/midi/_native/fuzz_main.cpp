// Standalone fuzz driver for the native SMF parser (smf.cpp).
//
// Compiled together with smf.cpp under AddressSanitizer/UBSan by
// tests/test_smf_fuzz.py. Parses every file given on the command line and
// walks the full C ABI (group info/names/notes/ccs/pbs, tempos, time
// signatures, key signatures, markers) so that any out-of-bounds access in
// either the parser or the accessors trips the sanitizer. Exit code 0 means
// the whole corpus was processed without a memory-safety or UB finding
// (parse *rejections* are fine — they are part of the contract).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void* smf_parse(const uint8_t* data, size_t len, char* err, size_t errcap);
void smf_free(void* h);
int32_t smf_division(void* h);
int32_t smf_group_count(void* h);
void smf_group_info(void* h, int32_t i, int32_t* program, int32_t* is_drum,
                    int64_t* note_count, int64_t* cc_count, int64_t* pb_count);
const char* smf_group_name(void* h, int32_t i);
void smf_group_notes(void* h, int32_t i, int32_t* pitch, int32_t* velocity,
                     int64_t* start, int64_t* end);
void smf_group_ccs(void* h, int32_t i, int64_t* out);
void smf_group_pbs(void* h, int32_t i, int64_t* out);
int64_t smf_tempo_count(void* h);
void smf_tempos(void* h, int64_t* ticks, double* bpm);
int64_t smf_timesig_count(void* h);
void smf_timesigs(void* h, int64_t* ticks, int32_t* num, int32_t* den);
int64_t smf_keysig_count(void* h);
const char* smf_keysig(void* h, int64_t i, int64_t* tick);
int64_t smf_marker_count(void* h);
const char* smf_marker(void* h, int64_t i, int64_t* tick, int64_t* textlen);
}

namespace {

// accumulate into a volatile sink so the walks cannot be optimized away
volatile uint64_t g_sink = 0;

void exercise(void* h) {
  g_sink += uint64_t(smf_division(h));
  int32_t ng = smf_group_count(h);
  for (int32_t i = 0; i < ng; ++i) {
    int32_t program, is_drum;
    int64_t nn, nc, npb;
    smf_group_info(h, i, &program, &is_drum, &nn, &nc, &npb);
    const char* name = smf_group_name(h, i);
    g_sink += name ? std::strlen(name) : 0;
    if (nn > 0) {
      std::vector<int32_t> pitch(nn), vel(nn);
      std::vector<int64_t> start(nn), end(nn);
      smf_group_notes(h, i, pitch.data(), vel.data(), start.data(), end.data());
      g_sink += uint64_t(pitch[0]) + uint64_t(end[nn - 1]);
    }
    if (nc > 0) {
      std::vector<int64_t> ccs(nc * 3);
      smf_group_ccs(h, i, ccs.data());
      g_sink += uint64_t(ccs[nc * 3 - 1]);
    }
    if (npb > 0) {
      std::vector<int64_t> pbs(npb * 2);
      smf_group_pbs(h, i, pbs.data());
      g_sink += uint64_t(pbs[npb * 2 - 1]);
    }
  }
  int64_t nt = smf_tempo_count(h);
  if (nt > 0) {
    std::vector<int64_t> ticks(nt);
    std::vector<double> bpm(nt);
    smf_tempos(h, ticks.data(), bpm.data());
    g_sink += uint64_t(ticks[nt - 1]);
  }
  int64_t nts = smf_timesig_count(h);
  if (nts > 0) {
    std::vector<int64_t> ticks(nts);
    std::vector<int32_t> num(nts), den(nts);
    smf_timesigs(h, ticks.data(), num.data(), den.data());
    g_sink += uint64_t(den[nts - 1]);
  }
  for (int64_t i = 0; i < smf_keysig_count(h); ++i) {
    int64_t tick;
    const char* name = smf_keysig(h, i, &tick);
    g_sink += (name ? std::strlen(name) : 0) + uint64_t(tick);
  }
  for (int64_t i = 0; i < smf_marker_count(h); ++i) {
    int64_t tick, textlen;
    const char* text = smf_marker(h, i, &tick, &textlen);
    if (text && textlen > 0) g_sink += uint64_t(uint8_t(text[textlen - 1]));
  }
}

}  // namespace

int main(int argc, char** argv) {
  for (int a = 1; a < argc; ++a) {
    FILE* f = std::fopen(argv[a], "rb");
    if (!f) {
      std::fprintf(stderr, "cannot open %s\n", argv[a]);
      return 2;
    }
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(sz > 0 ? size_t(sz) : 0);
    if (sz > 0 && std::fread(buf.data(), 1, size_t(sz), f) != size_t(sz)) {
      std::fclose(f);
      std::fprintf(stderr, "short read %s\n", argv[a]);
      return 2;
    }
    std::fclose(f);
    char err[256];
    void* h = smf_parse(buf.data(), buf.size(), err, sizeof(err));
    if (h) {
      exercise(h);
      smf_free(h);
    }
  }
  std::printf("ok (%llu)\n", (unsigned long long)g_sink);
  return 0;
}
