// Linker shim for running the reference's recursive_eval on a CPU-only
// torch build: the binary's phase-1 net creation calls the one-argument
// create_torchscript_net overload, which hardcodes device "cuda"
// (/root/reference/csrc/liars_dice/real_net.cc:129-131). Linked with
//   -Wl,--wrap=_ZN10liars_dice22create_torchscript_netERKNSt7__cxx1112basic_stringIcSt11char_traitsIcESaIcEEE
// this reroutes those calls to the explicit-device overload with "cpu",
// leaving every reference source untouched.
#include <memory>
#include <string>

namespace liars_dice {
class IValueNet;
std::shared_ptr<IValueNet> create_torchscript_net(const std::string& path,
                                                  const std::string& device);
}  // namespace liars_dice

// "__wrap_" + the original mangled name; extern "C" so the identifier is
// emitted verbatim for the linker to resolve.
extern "C" std::shared_ptr<liars_dice::IValueNet>
__wrap__ZN10liars_dice22create_torchscript_netERKNSt7__cxx1112basic_stringIcSt11char_traitsIcESaIcEEE(
    const std::string& path) {
  return liars_dice::create_torchscript_net(path, "cpu");
}
