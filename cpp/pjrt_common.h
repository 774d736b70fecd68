// Shared PJRT C-API plumbing for the C++ serving runtimes
// (pjrt_serve.cc — single-tensor artifact server — and pjrt_predict.cc —
// the full frame->JSON predict pipeline).
//
// Everything here is a thin, allocation-explicit wrapper over the PJRT
// C API: plugin loading, client/compile setup, artifact io_spec parsing,
// host<->device buffer helpers.  The API is append-only and
// version-negotiated, so a newer header drives an older plugin.
#ifndef SFH_CPP_PJRT_COMMON_H_
#define SFH_CPP_PJRT_COMMON_H_

#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <utility>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace sfh {

// The process-global API table (set by LoadPlugin).  One plugin per
// process — matches both binaries' single-client design.
inline const PJRT_Api*& Api() {
  static const PJRT_Api* api = nullptr;
  return api;
}

inline bool CheckError(PJRT_Error* err, const char* what) {
  if (err == nullptr) return true;
  PJRT_Error_Message_Args m;
  memset(&m, 0, sizeof m);
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = err;
  Api()->PJRT_Error_Message(&m);
  fprintf(stderr, "pjrt: %s failed: %.*s\n", what, (int)m.message_size,
          m.message);
  PJRT_Error_Destroy_Args d;
  memset(&d, 0, sizeof d);
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  Api()->PJRT_Error_Destroy(&d);
  return false;
}

inline bool AwaitEvent(PJRT_Event* ev, const char* what) {
  if (ev == nullptr) return true;
  PJRT_Event_Await_Args a;
  memset(&a, 0, sizeof a);
  a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  a.event = ev;
  bool ok = CheckError(Api()->PJRT_Event_Await(&a), what);
  PJRT_Event_Destroy_Args d;
  memset(&d, 0, sizeof d);
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = ev;
  Api()->PJRT_Event_Destroy(&d);
  return ok;
}

inline bool ReadFile(const std::string& path, std::string* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    fprintf(stderr, "pjrt: cannot read %s\n", path.c_str());
    return false;
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  *out = ss.str();
  return true;
}

struct TensorSpec {
  std::string name;  // empty for the input
  std::string dtype;  // numpy-style name
  std::vector<int64_t> dims;
};

inline int DtypeSize(const std::string& d) {
  if (d == "uint8" || d == "int8" || d == "bool") return 1;
  if (d == "bfloat16" || d == "float16" || d == "int16" || d == "uint16")
    return 2;
  if (d == "float32" || d == "int32" || d == "uint32") return 4;
  if (d == "float64" || d == "int64" || d == "uint64") return 8;
  return -1;
}

inline PJRT_Buffer_Type DtypeToPjrt(const std::string& d) {
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
// (written by compat/serving.save_serving in flattened calling order).
inline bool ParseIoSpec(const std::string& text, TensorSpec* input,
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
      fprintf(stderr, "pjrt: bad io_spec line: %s\n", line.c_str());
      return false;
    }
  }
  return have_input && !outputs->empty();
}

inline int64_t NumElements(const std::vector<int64_t>& dims) {
  int64_t n = 1;
  for (int64_t d : dims) n *= d;
  return n;
}

// dlopen the plugin, resolve GetPjrtApi, run PJRT_Plugin_Initialize.
inline bool LoadPlugin(const std::string& plugin) {
  void* handle = dlopen(plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (handle == nullptr) {
    fprintf(stderr, "pjrt: dlopen %s: %s\n", plugin.c_str(), dlerror());
    return false;
  }
  auto get_api = (const PJRT_Api* (*)())dlsym(handle, "GetPjrtApi");
  if (get_api == nullptr) {
    fprintf(stderr, "pjrt: %s has no GetPjrtApi\n", plugin.c_str());
    return false;
  }
  Api() = get_api();
  fprintf(stderr, "pjrt: plugin %s, PJRT C API %d.%d\n", plugin.c_str(),
          Api()->pjrt_api_version.major_version,
          Api()->pjrt_api_version.minor_version);
  PJRT_Plugin_Initialize_Args a;
  memset(&a, 0, sizeof a);
  a.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  return CheckError(Api()->PJRT_Plugin_Initialize(&a), "Plugin_Initialize");
}

// Create a client from "--opt key=value" pairs.  Integer-looking values
// are passed as kInt64, everything else as kString (PJRT_Client_Create
// named options are typed).  ``storage`` must outlive the call.
inline PJRT_Client* CreateClient(
    const std::vector<std::pair<std::string, std::string>>& raw_opts,
    std::vector<std::string>* storage) {
  std::vector<PJRT_NamedValue> opts;
  storage->reserve(storage->size() + raw_opts.size() * 2);
  for (auto& kv : raw_opts) {
    storage->push_back(kv.first);
    const std::string& k = storage->back();
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
      storage->push_back(kv.second);
      const std::string& v = storage->back();
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
  if (!CheckError(Api()->PJRT_Client_Create(&cc), "Client_Create"))
    return nullptr;
  return cc.client;
}

inline PJRT_Device* FirstDevice(PJRT_Client* client) {
  PJRT_Client_AddressableDevices_Args ad;
  memset(&ad, 0, sizeof ad);
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = client;
  if (!CheckError(Api()->PJRT_Client_AddressableDevices(&ad), "Devices"))
    return nullptr;
  if (ad.num_addressable_devices == 0) {
    fprintf(stderr, "pjrt: no addressable devices\n");
    return nullptr;
  }
  return ad.addressable_devices[0];
}

// Compile raw StableHLO bytecode with the artifact's CompileOptionsProto.
inline PJRT_LoadedExecutable* Compile(PJRT_Client* client,
                                      const std::string& module_bc,
                                      const std::string& compile_options) {
  PJRT_Program program;
  memset(&program, 0, sizeof program);
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(module_bc.data());
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
  if (!CheckError(Api()->PJRT_Client_Compile(&comp), "Compile"))
    return nullptr;
  return comp.executable;
}

// Number of outputs the compiled program actually produces (to validate
// a possibly-stale io_spec.txt before sizing output lists).
inline bool NumProgramOutputs(PJRT_LoadedExecutable* exec, size_t* n) {
  PJRT_LoadedExecutable_GetExecutable_Args ge;
  memset(&ge, 0, sizeof ge);
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = exec;
  if (!CheckError(Api()->PJRT_LoadedExecutable_GetExecutable(&ge),
                  "GetExecutable"))
    return false;
  PJRT_Executable_NumOutputs_Args no;
  memset(&no, 0, sizeof no);
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  bool ok = CheckError(Api()->PJRT_Executable_NumOutputs(&no), "NumOutputs");
  PJRT_Executable_Destroy_Args xd;
  memset(&xd, 0, sizeof xd);
  xd.struct_size = PJRT_Executable_Destroy_Args_STRUCT_SIZE;
  xd.executable = ge.executable;
  CheckError(Api()->PJRT_Executable_Destroy(&xd), "Executable_Destroy");
  if (ok) *n = no.num_outputs;
  return ok;
}

// Synchronous host->device upload.  Awaits done_with_host_buffer, i.e.
// ``data`` may be reused as soon as this returns (the transfer itself may
// still be in flight; PJRT sequences the execute after it).
inline PJRT_Buffer* UploadBuffer(PJRT_Client* client, PJRT_Device* device,
                                 const void* data, PJRT_Buffer_Type type,
                                 const std::vector<int64_t>& dims) {
  PJRT_Client_BufferFromHostBuffer_Args hb;
  memset(&hb, 0, sizeof hb);
  hb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  hb.client = client;
  hb.data = data;
  hb.type = type;
  hb.dims = dims.data();
  hb.num_dims = dims.size();
  hb.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  hb.device = device;
  if (!CheckError(Api()->PJRT_Client_BufferFromHostBuffer(&hb),
                  "BufferFromHostBuffer"))
    return nullptr;
  if (!AwaitEvent(hb.done_with_host_buffer, "host buffer transfer"))
    return nullptr;
  return hb.buffer;
}

// Synchronous device->host fetch into ``out`` (resized to the buffer's
// on-host size).  An explicit dense ROW-MAJOR host layout is requested:
// with a null host_layout PJRT copies in the buffer's DEVICE layout, and
// the TPU compiler is free to permute output dims (observed on the poi
// [B,N,2] output, which XLA transposes to put N on the lane dimension) —
// the bytes would arrive permuted with no indication.
inline bool FetchBuffer(PJRT_Buffer* buf, std::vector<char>* out) {
  PJRT_Buffer_Dimensions_Args dims;
  memset(&dims, 0, sizeof dims);
  dims.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
  dims.buffer = buf;
  if (!CheckError(Api()->PJRT_Buffer_Dimensions(&dims), "Buffer_Dimensions"))
    return false;
  std::vector<int64_t> minor_to_major(dims.num_dims);
  for (size_t i = 0; i < dims.num_dims; ++i)
    minor_to_major[i] = (int64_t)(dims.num_dims - 1 - i);
  PJRT_Buffer_MemoryLayout layout;
  memset(&layout, 0, sizeof layout);
  layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
  layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
  layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
  layout.tiled.minor_to_major = minor_to_major.data();
  layout.tiled.minor_to_major_size = minor_to_major.size();

  PJRT_Buffer_ToHostBuffer_Args th;
  memset(&th, 0, sizeof th);
  th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  th.src = buf;
  th.host_layout = &layout;
  if (!CheckError(Api()->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer size"))
    return false;
  out->resize(th.dst_size);
  th.dst = out->data();
  if (!CheckError(Api()->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer"))
    return false;
  return AwaitEvent(th.event, "device->host copy");
}

inline void DestroyBuffer(PJRT_Buffer* buf, const char* what) {
  if (buf == nullptr) return;
  PJRT_Buffer_Destroy_Args bd;
  memset(&bd, 0, sizeof bd);
  bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  bd.buffer = buf;
  CheckError(Api()->PJRT_Buffer_Destroy(&bd), what);
}

}  // namespace sfh

#endif  // SFH_CPP_PJRT_COMMON_H_
