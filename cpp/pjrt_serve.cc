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
// ~500 lines of C++ against the PJRT C API.  The same binary drives any
// PJRT backend: the real TPU via libaxon_pjrt.so / libtpu.so, or a CPU
// plugin where available.
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
#include <dlfcn.h>
#include <unistd.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

bool CheckError(PJRT_Error* err, const char* what) {
  if (err == nullptr) return true;
  PJRT_Error_Message_Args m;
  memset(&m, 0, sizeof m);
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = err;
  g_api->PJRT_Error_Message(&m);
  fprintf(stderr, "pjrt_serve: %s failed: %.*s\n", what, (int)m.message_size,
          m.message);
  PJRT_Error_Destroy_Args d;
  memset(&d, 0, sizeof d);
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  g_api->PJRT_Error_Destroy(&d);
  return false;
}

bool AwaitEvent(PJRT_Event* ev, const char* what) {
  if (ev == nullptr) return true;
  PJRT_Event_Await_Args a;
  memset(&a, 0, sizeof a);
  a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  a.event = ev;
  bool ok = CheckError(g_api->PJRT_Event_Await(&a), what);
  PJRT_Event_Destroy_Args d;
  memset(&d, 0, sizeof d);
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = ev;
  g_api->PJRT_Event_Destroy(&d);
  return ok;
}

bool ReadFile(const std::string& path, std::string* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    fprintf(stderr, "pjrt_serve: cannot read %s\n", path.c_str());
    return false;
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  *out = ss.str();
  return true;
}

struct TensorSpec {
  std::string name;          // empty for the input
  std::string dtype;         // numpy-style name
  std::vector<int64_t> dims;
};

int DtypeSize(const std::string& d) {
  if (d == "uint8" || d == "int8" || d == "bool") return 1;
  if (d == "bfloat16" || d == "float16" || d == "int16" || d == "uint16")
    return 2;
  if (d == "float32" || d == "int32" || d == "uint32") return 4;
  if (d == "float64" || d == "int64" || d == "uint64") return 8;
  return -1;
}

PJRT_Buffer_Type DtypeToPjrt(const std::string& d) {
  if (d == "uint8") return PJRT_Buffer_Type_U8;
  if (d == "int8") return PJRT_Buffer_Type_S8;
  if (d == "bool") return PJRT_Buffer_Type_PRED;
  if (d == "bfloat16") return PJRT_Buffer_Type_BF16;
  if (d == "float16") return PJRT_Buffer_Type_F16;
  if (d == "float32") return PJRT_Buffer_Type_F32;
  if (d == "float64") return PJRT_Buffer_Type_F64;
  if (d == "int32") return PJRT_Buffer_Type_S32;
  if (d == "int64") return PJRT_Buffer_Type_S64;
  if (d == "uint32") return PJRT_Buffer_Type_U32;
  if (d == "uint64") return PJRT_Buffer_Type_U64;
  return PJRT_Buffer_Type_INVALID;
}

// io_spec.txt: "input <dtype> <d0,d1,...>" / "output <name> <dtype> <dims>"
bool ParseIoSpec(const std::string& text, TensorSpec* input,
                 std::vector<TensorSpec>* outputs) {
  std::istringstream ss(text);
  std::string line;
  bool have_input = false;
  while (std::getline(ss, line)) {
    if (line.empty()) continue;
    std::istringstream ls(line);
    std::string kind;
    ls >> kind;
    TensorSpec t;
    if (kind == "input") {
      std::string dims;
      ls >> t.dtype >> dims;
      std::istringstream ds(dims);
      std::string d;
      while (std::getline(ds, d, ',')) t.dims.push_back(atoll(d.c_str()));
      *input = t;
      have_input = true;
    } else if (kind == "output") {
      std::string dims;
      ls >> t.name >> t.dtype >> dims;
      std::istringstream ds(dims);
      std::string d;
      while (std::getline(ds, d, ',')) t.dims.push_back(atoll(d.c_str()));
      outputs->push_back(t);
    } else {
      fprintf(stderr, "pjrt_serve: bad io_spec line: %s\n", line.c_str());
      return false;
    }
  }
  return have_input && !outputs->empty();
}

int64_t NumElements(const std::vector<int64_t>& dims) {
  int64_t n = 1;
  for (int64_t d : dims) n *= d;
  return n;
}

}  // namespace

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
  if (!ReadFile(artifact + "/module.mlir.bc", &module_bc) ||
      !ReadFile(artifact + "/compile_options.pb", &compile_options) ||
      !ReadFile(artifact + "/io_spec.txt", &io_spec_text) ||
      !ReadFile(input_path, &input_bytes))
    return 1;
  TensorSpec input;
  std::vector<TensorSpec> outputs;
  if (!ParseIoSpec(io_spec_text, &input, &outputs)) return 1;
  int esz = DtypeSize(input.dtype);
  PJRT_Buffer_Type in_type = DtypeToPjrt(input.dtype);
  if (esz < 0 || in_type == PJRT_Buffer_Type_INVALID) {
    fprintf(stderr, "pjrt_serve: unsupported input dtype %s\n",
            input.dtype.c_str());
    return 1;
  }
  int64_t want = NumElements(input.dims) * esz;
  if ((int64_t)input_bytes.size() != want) {
    fprintf(stderr,
            "pjrt_serve: input size mismatch: %s has %zu bytes, io_spec "
            "wants %lld\n",
            input_path.c_str(), input_bytes.size(), (long long)want);
    return 1;
  }

  // ---- plugin / client -----------------------------------------------------
  void* handle = dlopen(plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (handle == nullptr) {
    fprintf(stderr, "pjrt_serve: dlopen %s: %s\n", plugin.c_str(), dlerror());
    return 1;
  }
  auto get_api = (const PJRT_Api* (*)())dlsym(handle, "GetPjrtApi");
  if (get_api == nullptr) {
    fprintf(stderr, "pjrt_serve: %s has no GetPjrtApi\n", plugin.c_str());
    return 1;
  }
  g_api = get_api();
  fprintf(stderr, "pjrt_serve: plugin %s, PJRT C API %d.%d\n", plugin.c_str(),
          g_api->pjrt_api_version.major_version,
          g_api->pjrt_api_version.minor_version);
  {
    PJRT_Plugin_Initialize_Args a;
    memset(&a, 0, sizeof a);
    a.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    if (!CheckError(g_api->PJRT_Plugin_Initialize(&a), "Plugin_Initialize"))
      return 1;
  }

  std::vector<PJRT_NamedValue> opts;
  std::vector<std::string> opt_storage;  // keep strings alive
  opt_storage.reserve(raw_opts.size() * 2);
  for (auto& kv : raw_opts) {
    opt_storage.push_back(kv.first);
    const std::string& k = opt_storage.back();
    PJRT_NamedValue nv;
    memset(&nv, 0, sizeof nv);
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = k.c_str();
    nv.name_size = k.size();
    char* end = nullptr;
    long long iv = strtoll(kv.second.c_str(), &end, 10);
    if (end != nullptr && *end == '\0' && !kv.second.empty()) {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = iv;
      nv.value_size = 1;
    } else {
      opt_storage.push_back(kv.second);
      const std::string& v = opt_storage.back();
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = v.c_str();
      nv.value_size = v.size();
    }
    opts.push_back(nv);
  }
  PJRT_Client_Create_Args cc;
  memset(&cc, 0, sizeof cc);
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = opts.data();
  cc.num_options = opts.size();
  if (!CheckError(g_api->PJRT_Client_Create(&cc), "Client_Create")) return 1;
  PJRT_Client* client = cc.client;

  PJRT_Client_AddressableDevices_Args ad;
  memset(&ad, 0, sizeof ad);
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = client;
  if (!CheckError(g_api->PJRT_Client_AddressableDevices(&ad), "Devices"))
    return 1;
  if (ad.num_addressable_devices == 0) {
    fprintf(stderr, "pjrt_serve: no addressable devices\n");
    return 1;
  }
  PJRT_Device* device = ad.addressable_devices[0];

  // ---- compile -------------------------------------------------------------
  PJRT_Program program;
  memset(&program, 0, sizeof program);
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = module_bc.data();
  program.code_size = module_bc.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args comp;
  memset(&comp, 0, sizeof comp);
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = compile_options.data();
  comp.compile_options_size = compile_options.size();
  auto t0 = std::chrono::steady_clock::now();
  if (!CheckError(g_api->PJRT_Client_Compile(&comp), "Compile")) return 1;
  PJRT_LoadedExecutable* exec = comp.executable;
  auto t1 = std::chrono::steady_clock::now();
  fprintf(stderr, "pjrt_serve: compiled in %.1f s\n",
          std::chrono::duration<double>(t1 - t0).count());

  // validate io_spec.txt against the compiled program: a stale/edited
  // spec must be a clean error, not an out-of-bounds write into the
  // caller-sized output list
  {
    PJRT_LoadedExecutable_GetExecutable_Args ge;
    memset(&ge, 0, sizeof ge);
    ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    ge.loaded_executable = exec;
    if (!CheckError(g_api->PJRT_LoadedExecutable_GetExecutable(&ge),
                    "GetExecutable"))
      return 1;
    PJRT_Executable_NumOutputs_Args no;
    memset(&no, 0, sizeof no);
    no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    no.executable = ge.executable;
    if (!CheckError(g_api->PJRT_Executable_NumOutputs(&no), "NumOutputs"))
      return 1;
    PJRT_Executable_Destroy_Args xd;
    memset(&xd, 0, sizeof xd);
    xd.struct_size = PJRT_Executable_Destroy_Args_STRUCT_SIZE;
    xd.executable = ge.executable;
    CheckError(g_api->PJRT_Executable_Destroy(&xd), "Executable_Destroy");
    if (no.num_outputs != outputs.size()) {
      fprintf(stderr,
              "pjrt_serve: io_spec.txt lists %zu outputs but the program "
              "produces %zu — stale artifact?\n",
              outputs.size(), no.num_outputs);
      return 1;
    }
  }

  // ---- input buffer --------------------------------------------------------
  PJRT_Client_BufferFromHostBuffer_Args hb;
  memset(&hb, 0, sizeof hb);
  hb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  hb.client = client;
  hb.data = input_bytes.data();
  hb.type = in_type;
  hb.dims = input.dims.data();
  hb.num_dims = input.dims.size();
  hb.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  hb.device = device;
  if (!CheckError(g_api->PJRT_Client_BufferFromHostBuffer(&hb),
                  "BufferFromHostBuffer"))
    return 1;
  if (!AwaitEvent(hb.done_with_host_buffer, "host buffer transfer")) return 1;
  PJRT_Buffer* in_buf = hb.buffer;

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
    if (!CheckError(g_api->PJRT_LoadedExecutable_Execute(&ex), "Execute"))
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
      PJRT_Buffer_ToHostBuffer_Args th;
      memset(&th, 0, sizeof th);
      th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      th.src = out_buf[0];
      if (!CheckError(g_api->PJRT_Buffer_ToHostBuffer(&th), "sync size"))
        return 1;
      std::vector<char> sink(th.dst_size);
      th.dst = sink.data();
      if (!CheckError(g_api->PJRT_Buffer_ToHostBuffer(&th), "sync fetch"))
        return 1;
      if (!AwaitEvent(th.event, "sync fetch")) return 1;
    }
    auto tb1 = std::chrono::steady_clock::now();
    double ms = std::chrono::duration<double, std::milli>(tb1 - tb0).count() /
                (iters - 1);
    fprintf(stderr,
            "pjrt_serve: steady-state %.2f ms/batch over %d iters "
            "(%.1f inputs/s at batch %lld)\n",
            ms, iters - 1, 1e3 / ms * (double)input.dims[0],
            (long long)input.dims[0]);
    for (PJRT_Buffer* b : scratch) {
      if (b == nullptr) continue;
      PJRT_Buffer_Destroy_Args bd;
      memset(&bd, 0, sizeof bd);
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = b;
      CheckError(g_api->PJRT_Buffer_Destroy(&bd), "Buffer_Destroy(scratch)");
    }
  }

  // ---- outputs -------------------------------------------------------------
  std::string manifest;
  for (size_t i = 0; i < num_outputs; ++i) {
    PJRT_Buffer_ToHostBuffer_Args th;
    memset(&th, 0, sizeof th);
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = out_buf[i];
    if (!CheckError(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer size"))
      return 1;
    std::vector<char> host(th.dst_size);
    th.dst = host.data();
    if (!CheckError(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer"))
      return 1;
    if (!AwaitEvent(th.event, "device->host copy")) return 1;

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

    PJRT_Buffer_Destroy_Args bd;
    memset(&bd, 0, sizeof bd);
    bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    bd.buffer = out_buf[i];
    CheckError(g_api->PJRT_Buffer_Destroy(&bd), "Buffer_Destroy");
  }
  {
    std::ofstream f(out_dir + "/outputs.txt");
    f << manifest;
  }
  printf("%s", manifest.c_str());

  PJRT_Buffer_Destroy_Args bd;
  memset(&bd, 0, sizeof bd);
  bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  bd.buffer = in_buf;
  CheckError(g_api->PJRT_Buffer_Destroy(&bd), "Buffer_Destroy(input)");
  PJRT_LoadedExecutable_Destroy_Args ed;
  memset(&ed, 0, sizeof ed);
  ed.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  ed.executable = exec;
  CheckError(g_api->PJRT_LoadedExecutable_Destroy(&ed), "Executable_Destroy");
  PJRT_Client_Destroy_Args cd;
  memset(&cd, 0, sizeof cd);
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = client;
  CheckError(g_api->PJRT_Client_Destroy(&cd), "Client_Destroy");
  return 0;
}
