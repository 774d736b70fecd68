// pjrt_serve: C++ serving runtime for StableHLO artifacts — zero Python.
//
// Loads a PJRT C API plugin (.so), compiles the artifact's raw StableHLO
// bytecode (module.mlir.bc, written by compat/serving.save_serving), feeds
// it an input tensor from a raw binary file, and writes each output tensor
// as <out_dir>/<name>.bin plus an outputs.txt manifest.
//
// This is the native analog of the reference's Python serving stack
// (reference predict.py:195-208 unpickles a .pth into torch model code):
// here the entire model — weights, court constants, interval warp table,
// uint8 normalization — is inside one compiled program, and the runtime is
// a few hundred lines of C++ against the PJRT C API.  The same binary
// drives any PJRT backend: the real TPU via libaxon_pjrt.so / libtpu.so,
// or a CPU plugin where available.  For the full frames->JSON pipeline
// (decode, batching, writers) see pjrt_predict.cc.
//
// Usage:
//   pjrt_serve <artifact_dir> <input.bin> <out_dir> \
//       [--plugin /opt/axon/libaxon_pjrt.so] [--opt key=value ...] [--time]
//       [--iters N]
//
// --iters N re-executes the program N times (fresh output buffers each
// round, last round's outputs written) and reports steady-state ms/batch
// — a pure-C++ throughput measurement with no Python dispatch overhead.
//
// --opt values are PJRT_Client_Create named options; integers are passed
// as kInt64, everything else as kString.  For the axon TPU plugin pass:
//   --opt topology=v5e:1x1x1 --opt remote_compile=1 --opt n_slices=1 \
//   --opt session_id=<fresh> --opt rank=4294967295
// (and set AXON_POOL_SVC_OVERRIDE/AXON_LOOPBACK_RELAY in the env — see
// docs/DEPLOYMENT.md).
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "pjrt_common.h"

using sfh::Api;
using sfh::AwaitEvent;
using sfh::CheckError;
using sfh::TensorSpec;

int main(int argc, char** argv) {
  std::string artifact, input_path, out_dir;
  std::string plugin = "/opt/axon/libaxon_pjrt.so";
  std::vector<std::pair<std::string, std::string>> raw_opts;
  bool time_exec = false;
  int iters = 1;
  std::vector<std::string> pos;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--plugin" && i + 1 < argc) {
      plugin = argv[++i];
    } else if (a == "--opt" && i + 1 < argc) {
      std::string kv = argv[++i];
      size_t eq = kv.find('=');
      if (eq == std::string::npos) {
        fprintf(stderr, "pjrt_serve: --opt expects key=value\n");
        return 2;
      }
      raw_opts.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    } else if (a == "--time") {
      time_exec = true;
    } else if (a == "--iters" && i + 1 < argc) {
      iters = atoi(argv[++i]);
      if (iters < 1) iters = 1;
    } else {
      pos.push_back(a);
    }
  }
  if (pos.size() != 3) {
    fprintf(stderr,
            "usage: pjrt_serve <artifact_dir> <input.bin> <out_dir> "
            "[--plugin so] [--opt k=v ...] [--time]\n");
    return 2;
  }
  artifact = pos[0];
  input_path = pos[1];
  out_dir = pos[2];

  // ---- artifact files ------------------------------------------------------
  std::string module_bc, compile_options, io_spec_text, input_bytes;
  if (!sfh::ReadFile(artifact + "/module.mlir.bc", &module_bc) ||
      !sfh::ReadFile(artifact + "/compile_options.pb", &compile_options) ||
      !sfh::ReadFile(artifact + "/io_spec.txt", &io_spec_text) ||
      !sfh::ReadFile(input_path, &input_bytes))
    return 1;
  TensorSpec input;
  std::vector<TensorSpec> outputs;
  if (!sfh::ParseIoSpec(io_spec_text, &input, &outputs)) return 1;
  int esz = sfh::DtypeSize(input.dtype);
  PJRT_Buffer_Type in_type = sfh::DtypeToPjrt(input.dtype);
  if (esz < 0 || in_type == PJRT_Buffer_Type_INVALID) {
    fprintf(stderr, "pjrt_serve: unsupported input dtype %s\n",
            input.dtype.c_str());
    return 1;
  }
  int64_t want = sfh::NumElements(input.dims) * esz;
  if ((int64_t)input_bytes.size() != want) {
    fprintf(stderr,
            "pjrt_serve: input size mismatch: %s has %zu bytes, io_spec "
            "wants %lld\n",
            input_path.c_str(), input_bytes.size(), (long long)want);
    return 1;
  }

  // ---- plugin / client -----------------------------------------------------
  if (!sfh::LoadPlugin(plugin)) return 1;
  std::vector<std::string> opt_storage;
  PJRT_Client* client = sfh::CreateClient(raw_opts, &opt_storage);
  if (client == nullptr) return 1;
  PJRT_Device* device = sfh::FirstDevice(client);
  if (device == nullptr) return 1;

  // ---- compile -------------------------------------------------------------
  auto t0 = std::chrono::steady_clock::now();
  PJRT_LoadedExecutable* exec = sfh::Compile(client, module_bc,
                                             compile_options);
  if (exec == nullptr) return 1;
  auto t1 = std::chrono::steady_clock::now();
  fprintf(stderr, "pjrt_serve: compiled in %.1f s\n",
          std::chrono::duration<double>(t1 - t0).count());

  // validate io_spec.txt against the compiled program: a stale/edited
  // spec must be a clean error, not an out-of-bounds write into the
  // caller-sized output list
  {
    size_t n = 0;
    if (!sfh::NumProgramOutputs(exec, &n)) return 1;
    if (n != outputs.size()) {
      fprintf(stderr,
              "pjrt_serve: io_spec.txt lists %zu outputs but the program "
              "produces %zu — stale artifact?\n",
              outputs.size(), n);
      return 1;
    }
  }

  // ---- input buffer --------------------------------------------------------
  PJRT_Buffer* in_buf = sfh::UploadBuffer(client, device, input_bytes.data(),
                                          in_type, input.dims);
  if (in_buf == nullptr) return 1;

  // ---- execute -------------------------------------------------------------
  size_t num_outputs = outputs.size();
  std::vector<PJRT_Buffer*> out_buf(num_outputs, nullptr);
  PJRT_Buffer** out_list = out_buf.data();
  PJRT_Buffer* const arg_list[] = {in_buf};
  PJRT_Buffer* const* const arg_lists[] = {arg_list};

  PJRT_ExecuteOptions eo;
  memset(&eo, 0, sizeof eo);
  eo.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  // the input is reused across --iters rounds: forbid donation
  static const int64_t kNonDonatable[] = {0};
  eo.non_donatable_input_indices = kNonDonatable;
  eo.num_non_donatable_input_indices = 1;

  // Dispatch one round.  ``keep_outputs`` writes the round's output
  // buffers into out_buf (for the final round); intermediate rounds park
  // their buffers in ``scratch`` and are destroyed AFTER timing —
  // destroying an in-flight buffer can block on its producing execution,
  // which would serialize the queue.
  std::vector<PJRT_Buffer*> scratch;
  auto run_once = [&](bool keep_outputs, PJRT_Event** done_out) -> bool {
    PJRT_Event* done = nullptr;
    std::vector<PJRT_Buffer*> bufs(num_outputs, nullptr);
    PJRT_Buffer** list = keep_outputs ? out_list : bufs.data();
    PJRT_LoadedExecutable_Execute_Args ex;
    memset(&ex, 0, sizeof ex);
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = exec;
    ex.options = &eo;
    ex.argument_lists = arg_lists;
    ex.num_devices = 1;
    ex.num_args = 1;
    ex.output_lists = &list;
    ex.device_complete_events = done_out != nullptr ? &done : nullptr;
    if (!CheckError(Api()->PJRT_LoadedExecutable_Execute(&ex), "Execute"))
      return false;
    if (done_out != nullptr) *done_out = done;
    if (!keep_outputs)
      scratch.insert(scratch.end(), bufs.begin(), bufs.end());
    return true;
  };

  // warmup round (also the only round when iters == 1)
  PJRT_Event* done = nullptr;
  auto t2 = std::chrono::steady_clock::now();
  if (!run_once(/*keep_outputs=*/iters == 1, &done)) return 1;
  if (!AwaitEvent(done, "execution")) return 1;
  auto t3 = std::chrono::steady_clock::now();
  if (time_exec)
    fprintf(stderr, "pjrt_serve: executed in %.1f ms\n",
            std::chrono::duration<double, std::milli>(t3 - t2).count());
  if (iters > 1) {
    // queue all rounds, sync once: steady-state pipelined ms/batch (the
    // same protocol as bench.py / the serving latency sweep)
    auto tb0 = std::chrono::steady_clock::now();
    PJRT_Event* last = nullptr;
    for (int i = 0; i < iters - 1; ++i) {
      bool is_last = i == iters - 2;
      if (!run_once(/*keep_outputs=*/is_last, is_last ? &last : nullptr))
        return 1;
    }
    if (!AwaitEvent(last, "final execution")) return 1;
    // a D2H fetch of the last round's first output forces a REAL sync:
    // on relayed/tunneled runtimes the completion event can resolve
    // before the device finishes small programs (see CLAUDE.md), but a
    // host copy is a data dependency on the actual result
    {
      std::vector<char> sink;
      if (!sfh::FetchBuffer(out_buf[0], &sink)) return 1;
    }
    auto tb1 = std::chrono::steady_clock::now();
    double ms = std::chrono::duration<double, std::milli>(tb1 - tb0).count() /
                (iters - 1);
    fprintf(stderr,
            "pjrt_serve: steady-state %.2f ms/batch over %d iters "
            "(%.1f inputs/s at batch %lld)\n",
            ms, iters - 1, 1e3 / ms * (double)input.dims[0],
            (long long)input.dims[0]);
    for (PJRT_Buffer* b : scratch)
      sfh::DestroyBuffer(b, "Buffer_Destroy(scratch)");
  }

  // ---- outputs -------------------------------------------------------------
  std::string manifest;
  for (size_t i = 0; i < num_outputs; ++i) {
    std::vector<char> host;
    if (!sfh::FetchBuffer(out_buf[i], &host)) return 1;

    const TensorSpec& spec = outputs[i];
    std::string path = out_dir + "/" + spec.name + ".bin";
    std::ofstream f(path, std::ios::binary);
    f.write(host.data(), host.size());
    if (!f) {
      fprintf(stderr, "pjrt_serve: cannot write %s\n", path.c_str());
      return 1;
    }
    std::ostringstream line;
    line << spec.name << " " << spec.dtype << " ";
    for (size_t d = 0; d < spec.dims.size(); ++d)
      line << (d ? "," : "") << spec.dims[d];
    line << " " << host.size() << "\n";
    manifest += line.str();

    sfh::DestroyBuffer(out_buf[i], "Buffer_Destroy");
  }
  {
    std::ofstream f(out_dir + "/outputs.txt");
    f << manifest;
  }
  printf("%s", manifest.c_str());

  sfh::DestroyBuffer(in_buf, "Buffer_Destroy(input)");
  PJRT_LoadedExecutable_Destroy_Args ed;
  memset(&ed, 0, sizeof ed);
  ed.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  ed.executable = exec;
  CheckError(Api()->PJRT_LoadedExecutable_Destroy(&ed), "Executable_Destroy");
  PJRT_Client_Destroy_Args cd;
  memset(&cd, 0, sizeof cd);
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = client;
  CheckError(Api()->PJRT_Client_Destroy(&cd), "Client_Destroy");
  return 0;
}
