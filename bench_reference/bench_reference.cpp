// Measure the reference implementation (koide3/small_gicp, header-only at
// /root/reference) on THIS machine: single-thread GICP registration of the
// bundled scan pair, preprocessing excluded — the same contract as
// /root/repo/bench.py so vs_baseline becomes a same-host measurement
// instead of a documentation estimate.
//
// Build (Eigen headers come from the tensorflow wheel on this box):
//   g++ -O3 -march=native -std=c++17 \
//       -I/root/reference/include \
//       -I/opt/venv/lib/python3.12/site-packages/tensorflow/include \
//       bench_reference.cpp -o bench_reference
#include <chrono>
#include <cstdio>
#include <random>
#include <vector>

#include <small_gicp/benchmark/read_points.hpp>
#include <small_gicp/points/point_cloud.hpp>
#include <small_gicp/ann/kdtree.hpp>
#include <small_gicp/util/downsampling.hpp>
#include <small_gicp/util/normal_estimation.hpp>
#include <small_gicp/factors/gicp_factor.hpp>
#include <small_gicp/registration/reduction.hpp>
#include <small_gicp/registration/registration.hpp>

using namespace small_gicp;

int main(int argc, char** argv) {
  const double leaf = argc > 1 ? std::atof(argv[1]) : 0.25;
  const int iters = argc > 2 ? std::atoi(argv[2]) : 100;

  auto t_raw = read_ply("/root/reference/data/target.ply");
  auto s_raw = read_ply("/root/reference/data/source.ply");
  auto target = std::make_shared<PointCloud>(t_raw);
  auto source = std::make_shared<PointCloud>(s_raw);
  target = voxelgrid_sampling(*target, leaf);
  source = voxelgrid_sampling(*source, leaf);
  auto target_tree = std::make_shared<KdTree<PointCloud>>(target);
  auto source_tree = std::make_shared<KdTree<PointCloud>>(source);
  estimate_covariances(*target, *target_tree, 10);
  estimate_covariances(*source, *source_tree, 10);
  std::printf("target=%zu source=%zu points after %.2f m downsample\n",
              target->size(), source->size(), leaf);

  // Same noise magnitudes as bench.py: rot ~N(0, 0.03), trans ~N(0, 0.2).
  std::mt19937 rng(0);
  std::normal_distribution<double> nr(0.0, 0.03), nt(0.0, 0.2);
  std::vector<Eigen::Isometry3d> inits(iters);
  for (auto& T : inits) {
    Eigen::Matrix<double, 6, 1> tw;
    tw << nr(rng), nr(rng), nr(rng), nt(rng), nt(rng), nt(rng);
    T = Eigen::Isometry3d(se3_exp(tw));
  }

  Registration<GICPFactor, SerialReduction> registration;

  // warmup
  registration.align(*target, *source, *target_tree, inits[0]);

  double checksum = 0.0;
  size_t total_iters = 0;
  const auto t0 = std::chrono::high_resolution_clock::now();
  for (int i = 0; i < iters; i++) {
    auto result = registration.align(*target, *source, *target_tree, inits[i]);
    checksum += result.T_target_source.translation().x();
    total_iters += result.iterations;
  }
  const auto t1 = std::chrono::high_resolution_clock::now();
  const double sec = std::chrono::duration<double>(t1 - t0).count();
  std::printf("checksum=%f mean_opt_iters=%.1f\n", checksum,
              double(total_iters) / iters);
  std::printf("single_thread_gicp: %.2f ms/registration, %.2f reg/s\n",
              sec * 1e3 / iters, iters / sec);
  return 0;
}
