// Cross-validation harness for photometric_bundle_adjustment_tpu/io/
// cereal_io.py: exercises the REFERENCE's own binary-cereal adapters
// (include/visnav/serialization.h + map_utils.h save_map_file/
// load_map_file) so the Python reader/writer can be checked byte-for-byte
// against the real thing without rebuilding Ceres/OpenGV.
//
//   test_cereal_io write <map.cereal>   — write a fixed test map
//   test_cereal_io read  <map.cereal>   — load a map, print canonical dump
//
// Build (headers only + tbb):
//   g++ -std=c++17 -faligned-new -O1 -DEIGEN_MAX_ALIGN_BYTES=16 \
//       -Ioverlay_include -I$REF/include -Ipangolin_stub \
//       -I$REF/thirdparty/eigen -I$REF/thirdparty/Sophus \
//       -I$REF/thirdparty/cereal/include \
//       test_cereal_io.cpp -ltbb -o bin/test_cereal_io

#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <string>

#include <visnav/common_types.h>
#include <visnav/calibration.h>
#include <visnav/serialization.h>

#include <cereal/archives/binary.hpp>

using namespace visnav;

static void save_map(const std::string& path, const Corners& corners,
                     const Matches& matches, const FeatureTracks& tracks,
                     const FeatureTracks& outliers, const Cameras& cameras,
                     const Landmarks& landmarks) {
  // identical payload order to map_utils.h:58-86 save_map_file
  std::ofstream os(path, std::ios::binary);
  cereal::BinaryOutputArchive archive(os);
  archive(corners);
  archive(matches);
  archive(tracks);
  archive(outliers);
  archive(cameras);
  archive(landmarks);
}

static void load_map(const std::string& path, Corners& corners,
                     Matches& matches, FeatureTracks& tracks,
                     FeatureTracks& outliers, Cameras& cameras,
                     Landmarks& landmarks) {
  std::ifstream is(path, std::ios::binary);
  cereal::BinaryInputArchive archive(is);
  archive(corners);
  archive(matches);
  archive(tracks);
  archive(outliers);
  archive(cameras);
  archive(landmarks);
}

static std::bitset<256> desc_with_bits(std::initializer_list<int> bits) {
  std::bitset<256> b;
  for (int i : bits) b.set(i);
  return b;
}

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s write|read <path>\n", argv[0]);
    return 2;
  }
  const std::string mode = argv[1], path = argv[2];

  if (mode == "write") {
    Corners corners;
    KeypointsData kd;
    kd.corners.push_back(Eigen::Vector2d(10.5, 20.25));
    kd.corners.push_back(Eigen::Vector2d(300.0, 400.0));
    kd.corner_angles = {0.5, -1.25};
    kd.corner_descriptors.push_back(desc_with_bits({0, 37, 255}));
    kd.corner_descriptors.push_back(desc_with_bits({1, 128}));
    corners[FrameCamId(0, 0)] = kd;
    KeypointsData kd2;
    kd2.corners.push_back(Eigen::Vector2d(1.0, 2.0));
    kd2.corner_angles = {3.0};
    kd2.corner_descriptors.push_back(desc_with_bits({64}));
    corners[FrameCamId(3, 1)] = kd2;

    Matches matches;
    MatchData md;
    md.T_i_j = Sophus::SE3d(
        Eigen::Quaterniond(0.9238795325112867, 0.0, 0.3826834323650898, 0.0),
        Eigen::Vector3d(0.1, -0.2, 0.3));
    md.matches = {{0, 1}, {1, 0}};
    md.inliers = {{0, 1}};
    matches[std::make_pair(FrameCamId(0, 0), FrameCamId(3, 1))] = md;

    FeatureTracks tracks;
    tracks[7][FrameCamId(0, 0)] = 0;
    tracks[7][FrameCamId(3, 1)] = 1;
    FeatureTracks outliers;
    outliers[11][FrameCamId(0, 0)] = 1;

    Cameras cameras;
    Camera c0;
    c0.T_w_c = Sophus::SE3d(Eigen::Quaterniond::Identity(),
                            Eigen::Vector3d(1.0, 2.0, 3.0));
    cameras[FrameCamId(0, 0)] = c0;

    Landmarks landmarks;
    Landmark lm;
    lm.inv_depth = 0.25;
    lm.obs[FrameCamId(0, 0)] = 0;
    lm.obs[FrameCamId(3, 1)] = 1;
    lm.outlier_obs[FrameCamId(5, 0)] = 2;
    landmarks[7] = lm;

    save_map(path, corners, matches, tracks, outliers, cameras, landmarks);
    std::printf("wrote %s\n", path.c_str());
    return 0;
  }

  if (mode == "read") {
    Corners corners;
    Matches matches;
    FeatureTracks tracks, outliers;
    Cameras cameras;
    Landmarks landmarks;
    load_map(path, corners, matches, tracks, outliers, cameras, landmarks);

    // canonical (sorted) dump for the Python side to compare
    std::map<FrameCamId, KeypointsData> sc(corners.begin(), corners.end());
    for (const auto& kv : sc) {
      std::printf("corner %ld %zu n=%zu", kv.first.frame_id,
                  kv.first.cam_id, kv.second.corners.size());
      for (size_t i = 0; i < kv.second.corners.size(); i++) {
        std::printf(" (%.6f,%.6f,a=%.6f,d=%zu)", kv.second.corners[i][0],
                    kv.second.corners[i][1], kv.second.corner_angles[i],
                    kv.second.corner_descriptors[i].count());
      }
      std::printf("\n");
    }
    std::map<std::pair<FrameCamId, FrameCamId>, MatchData> sm(
        matches.begin(), matches.end());
    for (const auto& kv : sm) {
      const auto& t = kv.second.T_i_j;
      std::printf(
          "match (%ld,%zu)-(%ld,%zu) t=%.6f,%.6f,%.6f q=%.6f,%.6f,%.6f,%.6f "
          "ninl=%zu nmatch=%zu\n",
          kv.first.first.frame_id, kv.first.first.cam_id,
          kv.first.second.frame_id, kv.first.second.cam_id,
          t.translation()[0], t.translation()[1], t.translation()[2],
          t.so3().data()[0], t.so3().data()[1], t.so3().data()[2],
          t.so3().data()[3], kv.second.inliers.size(),
          kv.second.matches.size());
    }
    std::map<TrackId, FeatureTrack> st(tracks.begin(), tracks.end());
    for (const auto& kv : st) {
      std::printf("track %ld:", kv.first);
      for (const auto& ob : kv.second)
        std::printf(" (%ld,%zu)->%d", ob.first.frame_id, ob.first.cam_id,
                    ob.second);
      std::printf("\n");
    }
    std::printf("outlier_tracks %zu cameras %zu\n", outliers.size(),
                cameras.size());
    for (const auto& kv : cameras) {
      const auto& t = kv.second.T_w_c;
      std::printf("camera (%ld,%zu) t=%.6f,%.6f,%.6f\n", kv.first.frame_id,
                  kv.first.cam_id, t.translation()[0], t.translation()[1],
                  t.translation()[2]);
    }
    std::map<TrackId, Landmark> sl(landmarks.begin(), landmarks.end());
    for (const auto& kv : sl) {
      std::printf("landmark %ld rho=%.6f nobs=%zu nout=%zu\n", kv.first,
                  kv.second.inv_depth, kv.second.obs.size(),
                  kv.second.outlier_obs.size());
    }
    return 0;
  }

  std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
  return 2;
}
