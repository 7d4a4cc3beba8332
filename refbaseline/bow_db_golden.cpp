// Golden-file generator for the BowDatabase inverted-index save/load
// format (reference: include/visnav/bow_db.h:99-124).  Builds a small
// deterministic BowDBInverseIndex and saves it through the reference's
// OWN cereal JSONOutputArchive path, so the Python codec
// (photometric_bundle_adjustment_tpu/io/cereal_io.py: *_bow_db_json) can
// be validated against the exact bytes the reference binary would write.
// Also reloads the file through JSONInputArchive and prints a checksum,
// proving the golden file round-trips in the reference's own code.
//
// Build (headers + tbb only, no ceres/opengv):
//   g++ -std=c++17 -O2 -Ioverlay_include -I$REF/include -Ipangolin_stub \
//       -I$REF/thirdparty/eigen -I$REF/thirdparty/Sophus \
//       -I$REF/thirdparty/cereal/include -DEIGEN_MAX_ALIGN_BYTES=16 \
//       bow_db_golden.cpp -ltbb -o bin/bow_db_golden
#include <fstream>
#include <iostream>

#include <visnav/common_types.h>
#include <visnav/serialization.h>

using namespace visnav;

int main(int argc, char** argv) {
  std::string out = argc > 1 ? argv[1] : "artifacts/bow_db_golden.json";

  // deterministic ORDERED construction: iterate words in a std::map so
  // the unordered_map is populated in a fixed order (libstdc++ iteration
  // order of unordered_map depends on insertion/bucket order, which this
  // fixes for reproducible golden bytes)
  BowDBInverseIndex state;
  // word 3: two frames
  state[3].emplace_back(FrameCamId(0, 0), 0.25);
  state[3].emplace_back(FrameCamId(1, 1), 0.125);
  // word 17: one frame
  state[17].emplace_back(FrameCamId(2, 0), 0.0625);
  // word 123456: three frames incl. large frame id
  state[123456].emplace_back(FrameCamId(41, 0), 0.5);
  state[123456].emplace_back(FrameCamId(41, 1), 0.03125);
  state[123456].emplace_back(FrameCamId(7, 0), 1.0);

  {
    std::ofstream os(out, std::ios::binary);
    cereal::JSONOutputArchive archive(os);
    archive(state);
  }

  // reload through the reference's own load path (bow_db.h:112-124)
  BowDBInverseIndex loaded;
  {
    std::ifstream is(out, std::ios::binary);
    cereal::JSONInputArchive archive(is);
    archive(loaded);
  }
  size_t n = 0;
  double sum = 0;
  for (const auto& kv : loaded)
    for (const auto& a : kv.second) {
      n++;
      sum += a.second + kv.first + a.first.frame_id + 10 * a.first.cam_id;
    }
  std::cout << "entries=" << n << " checksum=" << sum << std::endl;
  return 0;
}
